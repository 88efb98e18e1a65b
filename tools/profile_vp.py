"""Per-stage serial-cost attribution for the payload-verified crawl.

The 1->4 scaling series (BENCH/BASELINE.md r3-43..47) sits at raw
0.72-0.84 with walls T1 ~ 137 s / T4 ~ 45 s. An Amdahl fit on those
walls says ~14 s of each run does NOT scale with cores:
    T1 = S + P, T4 = S + P/4  =>  S ~ 14 s, P ~ 123 s
and removing half of S would move 1->4 raw efficiency from ~0.76 to
~0.86. This tool attributes S to named stages: it runs the SAME VP
bench job (bench.run_verified_crawl, identical corpus/seeds/config)
at local[N] for each requested N with URLMAP_CRAWL_DEBUG=1 and parses
the per-round tick lines, printing a stage x cores table plus each
stage's 1->4 scaling. A stage whose time is flat across cores IS the
serial residue.

Usage: python tools/profile_vp.py [cores ...]   (default: 1 4)
Run with the box to itself, like any scaling measurement.
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["URLMAP_CRAWL_DEBUG"] = "1"

import bench  # noqa: E402  (sets driver mem before any session)

TICK_RE = re.compile(r"\[r(\d+)\] (\S+)\s+([0-9.]+)s")


def profile(n: int) -> tuple[dict[str, float], float, dict]:
    from urlmap_spark.session import get_spark

    spark = get_spark(master=f"local[{n}]", app_name=f"profile_vp_{n}")
    spark.sparkContext.setLogLevel("ERROR")
    vcp = bench.ensure_vp_corpus(spark)
    buf = io.StringIO()
    t0 = time.time()
    with contextlib.redirect_stdout(buf):
        r = bench.run_verified_crawl(spark, vcp)
    wall = time.time() - t0
    spark.stop()
    # raw per-round ticks: round 0 carries one-time costs (codegen
    # compile, python-worker fork) that the aggregate hides
    with open(f"/tmp/profile_vp_ticks_local{n}.txt", "w") as f:
        f.write(buf.getvalue())
    stages: dict[str, float] = {}
    for m in TICK_RE.finditer(buf.getvalue()):
        stages[m.group(2)] = stages.get(m.group(2), 0.0) + float(m.group(3))
    return stages, wall, r


def main() -> None:
    cores = [int(a) for a in sys.argv[1:]] or [1, 4]
    # Pre-generate the corpus at full width so a cold /tmp doesn't charge
    # corpus generation to the first (possibly 1-core) profiled point.
    if not os.path.exists(os.path.join(bench.vp_corpus_path(), "_SUCCESS")):
        from urlmap_spark.session import get_spark

        gen = get_spark(master="local[32]", app_name="profile_gen")
        gen.sparkContext.setLogLevel("ERROR")
        bench.ensure_vp_corpus(gen)
        gen.stop()
    rows: dict[int, tuple[dict[str, float], float, dict]] = {}
    for n in cores:
        rows[n] = profile(n)
        print(f"local[{n}]: wall {rows[n][1]:.1f}s  "
              f"crawl wall_s {rows[n][2]['wall_s']}  "
              f"steady {rows[n][2]['steady_urls_per_sec']}", flush=True)
    names = sorted({k for st, _, _ in rows.values() for k in st})
    hdr = "stage".ljust(22) + "".join(f"local[{n}]".rjust(12) for n in cores)
    print("\n" + hdr)
    for name in names:
        line = name.ljust(22)
        for n in cores:
            line += f"{rows[n][0].get(name, 0.0):12.2f}"
        print(line)
    # untracked = crawl wall minus summed ticks (setup, loop glue, final fold)
    line = "(untracked)".ljust(22)
    for n in cores:
        st, _, r = rows[n]
        line += f"{r['wall_s'] - sum(st.values()):12.2f}"
    print(line)
    line = "TOTAL(crawl wall_s)".ljust(22)
    for n in cores:
        line += f"{rows[n][2]['wall_s']:12.2f}"
    print(line)
    if len(cores) == 2 and cores[1] == 4 * cores[0]:
        lo, hi = cores
        print(f"\nper-stage {lo}->{hi} scaling (t_lo / t_hi / 4; 1.0 = perfect):")
        for name in names:
            tl, th = rows[lo][0].get(name, 0.0), rows[hi][0].get(name, 0.0)
            if th > 0.05:
                print(f"  {name:22s} {tl / th / 4:6.2f}   "
                      f"(serial share of hi wall: {th - tl / 4:5.1f}s excess)")


if __name__ == "__main__":
    main()
