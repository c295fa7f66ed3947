"""Scoped session-conf for driver-orchestrated iterative fixpoints.

``loop_conf`` pins three settings for the duration of an iteration loop
and restores the caller's values on exit (including on exception):

- ``spark.sql.adaptive.enabled=false`` — inside the loops every round's
  partitioning is already explicitly sized, so AQE has nothing to
  re-plan, but it still MATERIALIZES each shuffle query stage as its own
  Spark job; at O(log d) / O(iters) rounds that stage-job tax dominates
  on metadata-sized iteration state (r16 drift-watch escalation measured
  30 -> 19 jobs, -29% wall on the deep lineage fixture).
- ``spark.sql.shuffle.partitions=<parts>`` — the MEASURED size of the
  iteration state (closure pairs, vocab), not the session width: a
  metadata-sized state otherwise pays a full session-width task launch
  per exchange per round. At scale ``parts`` grows with the state, so
  nothing is tuned to the local core count.
- ``spark.sql.autoBroadcastJoinThreshold=-1`` — a broadcast build is its
  own Spark job every round; with the shuffle width pinned, the
  per-round self-join runs as a shuffle join INSIDE the round's single
  materializing action instead (r21, guide §2.4/§3.1).

Concurrency caveat: this mutates SESSION-GLOBAL confs for the scope's
duration, which assumes strictly SERIAL query execution on the session
(true under the driver contract and pytest). Nested scopes are safe
serially: each exit restores the values its own entry observed, and the
restore SETS each key explicitly even when the entry value was only the
SQLConf default.

NOTE: the settings take effect at PLAN/ACTION time, not DataFrame-build
time — every action that should run under the loop conf (per-round
convergence counts, the final materializing checkpoint) must execute
INSIDE the ``with`` block; a lazily-returned DataFrame planned outside
the scope sees the caller's session conf again.
"""

from __future__ import annotations

from contextlib import contextmanager


@contextmanager
def loop_conf(spark, parts: int):
    keys = {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.shuffle.partitions": str(parts),
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k) for k in keys}
    for k, v in keys.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
