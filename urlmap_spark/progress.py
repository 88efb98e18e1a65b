"""Live progress ticker — the reference's ProgressReporter re-expressed
for a batch engine (internal/progress/progress.go:27-298).

The reference increments per-URL counters from worker goroutines and a
1 s ticker goroutine repaints a single ``\\r`` status line
(progress.go:162-181, 272-298), then Stop() prints a final-statistics
block (progress.go:301-331). Here the unit of progress is a ROUND:
``on_round`` is a ``CrawlConfig.progress`` callback that folds each
round's metrics dict into the counters, and a daemon thread repaints
the status line every ``update_interval`` seconds. Mid-round liveness
comes from polling the Spark status tracker for the number of active
tasks — the batch stand-in for ``ActiveWorkers`` (progress.go:19).

Counter mapping (reference Stats, progress.go:13-24):

- ``URLsProcessed``  <- sum of per-round ``processed``; when the crawl
  defers its metrics fold (the per-round dict carries no ``processed``
  yet) the ticker estimates ``frontier - skipped_depth -
  blocked_robots`` and ``finalize()`` replaces the estimates with the
  folded truth before the final block prints.
- ``URLsDiscovered`` <- round-0 frontier (the seeds) + sum of
  ``new_discovered``.
- ``URLsFailed``     <- sum of ``failed``.
- ``URLsSkipped``    <- sum of ``skipped_depth + blocked_robots``.
- ``QueueSize``      <- the last round's ``new_discovered + deferred +
  retried`` (the actual next frontier, plans/crawl.py), so the ticker
  switches to the reference's "Processed:" idle format
  (progress.go:289-295) exactly when the frontier drains — including
  under politeness deferral or retry re-enqueues.

Reporting must never kill a crawl (the reference swallows display
errors the same way): every poll/paint is exception-guarded.

The reference's RateLimiter half of the module (progress.go:41-159,
a wall-clock token bucket) deliberately has no analog here — in a
batch plan the request-rate contract is the ``global_cap`` schedule
(operators/politeness.py), a plan property, not a clock.
"""

from __future__ import annotations

import sys
import threading
import time


class LiveProgressReporter:
    """Batch analog of progress.go's ProgressReporter.

    Use as a library: ``r = LiveProgressReporter(spark); r.start();
    cfg = CrawlConfig(progress=r.on_round); ...; r.finalize(
    run.metrics); r.stop()``. ``stop()`` prints the reference's final
    statistics block; ``cancel()`` tears the thread down silently (the
    error path).
    """

    def __init__(self, spark=None, output=None, update_interval: float = 1.0,
                 show_progress: bool = True):
        self._spark = spark
        self._out = output if output is not None else sys.stderr
        # the reference clamps a non-positive interval to the 1 s
        # default (progress.go:83-85)
        self._interval = update_interval if update_interval > 0 else 1.0
        self._show = show_progress
        self._lock = threading.Lock()
        self._done = threading.Event()
        self._thread: threading.Thread | None = None
        self._t0 = time.time()
        self._rounds = 0
        self.processed = 0
        self.discovered = 0
        self.failed = 0
        self.skipped = 0
        self.queue_size = 0

    # -- lifecycle (progress.go:162-198) --------------------------------

    def start(self) -> None:
        if not self._show or self._thread is not None:
            return
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="urlmap-progress")
        self._thread.start()

    def stop(self) -> None:
        """Stop the ticker and print the final statistics block
        (progress.go:184-198 + displayFinalStats 301-331)."""
        self.cancel()
        if self._show:
            self._final_block()

    def cancel(self) -> None:
        """Stop the ticker with no final block (crawl error path)."""
        self._done.set()
        if self._thread is not None:
            self._thread.join(timeout=5.0)
            self._thread = None

    # -- counters --------------------------------------------------------

    def on_round(self, m: dict) -> None:
        """``CrawlConfig.progress`` callback: fold one round's metrics."""
        with self._lock:
            frontier = int(m.get("frontier", 0) or 0)
            skipped = (int(m.get("skipped_depth", 0) or 0)
                       + int(m.get("blocked_robots", 0) or 0))
            deferred = int(m.get("deferred", 0) or 0)
            retried = int(m.get("retried", 0) or 0)
            if "processed" in m:
                self.processed += int(m.get("processed", 0) or 0)
            else:
                # deferred metrics fold: a frontier row is processed
                # unless it was skipped, deferred to the next round by a
                # politeness budget, or re-enqueued for retry (ADVICE r3:
                # deferred/retried rows re-enter the next frontier and
                # must not be double-counted as processed here)
                self.processed += max(frontier - skipped - deferred - retried, 0)
            # the round-0 frontier IS the seed list; keyed on the metric
            # dict's own round index, not a local call counter, so a
            # --resume run's first callback (round > 0) is never
            # miscounted as seed discoveries (ADVICE r3)
            if int(m.get("round", self._rounds) or 0) == 0:
                self.discovered += frontier  # the seeds
            self.discovered += int(m.get("new_discovered", 0) or 0)
            self.failed += int(m.get("failed", 0) or 0)
            self.skipped += skipped
            # the actual next frontier = new discoveries + politeness
            # deferrals + retry re-enqueues (plans/crawl.py n_frontier);
            # new_discovered alone would flip the ticker into the drained
            # 'Processed:' format while the crawl continues (ADVICE r3)
            self.queue_size = (int(m.get("new_discovered", 0) or 0)
                               + deferred + retried)
            self._rounds += 1

    def finalize(self, metrics: list[dict]) -> None:
        """Replace the incrementally-estimated counters with the folded
        per-round metrics (authoritative after crawl() returns even
        when the in-flight dicts were pre-fold)."""
        with self._lock:
            if not metrics:
                return
            self.processed = sum(int(m.get("processed", 0) or 0) for m in metrics)
            self.failed = sum(int(m.get("failed", 0) or 0) for m in metrics)
            self.skipped = sum(int(m.get("skipped_depth", 0) or 0)
                               + int(m.get("blocked_robots", 0) or 0)
                               for m in metrics)
            # seeds = the round-0 frontier; a resumed run's metrics list
            # still starts at round 0 (read back from the checkpoint)
            seeds = next((int(m.get("frontier", 0) or 0) for m in metrics
                          if int(m.get("round", 0) or 0) == 0), 0)
            self.discovered = (seeds
                               + sum(int(m.get("new_discovered", 0) or 0)
                                     for m in metrics))
            last = metrics[-1]
            self.queue_size = (int(last.get("new_discovered", 0) or 0)
                               + int(last.get("deferred", 0) or 0)
                               + int(last.get("retried", 0) or 0))

    def get_stats(self) -> dict:
        """Snapshot, with elapsed/rate computed at read time like the
        reference's GetStats (progress.go:257-269)."""
        with self._lock:
            elapsed = time.time() - self._t0
            rate = self.processed / elapsed if elapsed > 0 else 0.0
            return {
                "processed": self.processed,
                "discovered": self.discovered,
                "failed": self.failed,
                "skipped": self.skipped,
                "queue_size": self.queue_size,
                "active_tasks": 0,  # filled by the ticker thread only
                "elapsed_s": elapsed,
                "rate": rate,
            }

    # -- ticker internals --------------------------------------------------

    def _active_tasks(self) -> int:
        """Number of Spark tasks running right now — the batch analog of
        ActiveWorkers. Zero (never an exception) when no session."""
        if self._spark is None:
            return 0
        try:
            st = self._spark.sparkContext.statusTracker()
            n = 0
            for sid in st.getActiveStageIds():
                info = st.getStageInfo(sid)
                if info is not None:
                    n += max(int(info.numActiveTasks), 0)
            return n
        except Exception:
            return 0

    def _loop(self) -> None:
        while not self._done.wait(self._interval):
            try:
                self._paint()
            except Exception:
                pass  # reporting must never kill a crawl

    def _paint(self) -> None:
        s = self.get_stats()
        if s["processed"] == 0 and s["discovered"] == 0:
            return  # nothing to show yet (progress.go:275-277)
        if s["queue_size"] > 0:
            # still crawling (progress.go:281-288); "workers" -> tasks
            msg = ("\rCrawling: %d/%d URLs processed (%.1f URLs/sec) "
                   "[%d tasks, %d queued]"
                   % (s["processed"], s["discovered"], s["rate"],
                      self._active_tasks(), s["queue_size"]))
        else:
            # drained / finishing (progress.go:289-295)
            msg = ("\rProcessed: %d URLs (%.1f URLs/sec, %.1fs elapsed)"
                   % (s["processed"], s["rate"], s["elapsed_s"]))
        self._out.write(msg)
        try:
            self._out.flush()
        except Exception:
            pass

    def _final_block(self) -> None:
        s = self.get_stats()
        w = self._out
        w.write("\r")
        w.write("Crawling completed in %.2fs:\n" % s["elapsed_s"])
        w.write("  URLs discovered: %d\n" % s["discovered"])
        w.write("  URLs processed:  %d\n" % s["processed"])
        if s["failed"] > 0:
            w.write("  URLs failed:     %d\n" % s["failed"])
        if s["skipped"] > 0:
            w.write("  URLs skipped:    %d\n" % s["skipped"])
        w.write("  Average rate:    %.1f URLs/sec\n" % s["rate"])
        w.write("\n")
        try:
            w.flush()
        except Exception:
            pass
