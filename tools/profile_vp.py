"""Profile the payload-verified crawl per-stage at two parallelism levels.

Prints the per-round tick breakdown (URLMAP_CRAWL_DEBUG=1) so the
non-scaling stage is visible. Usage: python tools/profile_vp.py [cores ...]
"""

import os
import sys
import time

os.environ["URLMAP_CRAWL_DEBUG"] = "1"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from urlmap_spark.session import get_spark  # noqa: E402


def main() -> None:
    cores = [int(c) for c in sys.argv[1:]] or [4, 16]
    gen = get_spark(master="local[32]", app_name="profile_gen")
    gen.sparkContext.setLogLevel("ERROR")
    cp = bench.ensure_vp_corpus(gen)
    gen.stop()
    for n in cores:
        spark = get_spark(master=f"local[{n}]", app_name=f"profile_vp_{n}")
        spark.sparkContext.setLogLevel("ERROR")
        t0 = time.time()
        r = bench.run_verified_crawl(spark, cp)
        print(f"== local[{n}]: {r} total {time.time() - t0:.1f}s", flush=True)
        spark.stop()


if __name__ == "__main__":
    main()
