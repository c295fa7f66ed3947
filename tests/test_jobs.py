from __future__ import annotations

import tempfile

from databricks_observe_spark.jobs import observe_cycle


def test_observe_cycle_end_to_end(spark):
    out = tempfile.mkdtemp(prefix="cycle_")
    counts = observe_cycle(spark, "/root/testdata/sf0.001", out)
    assert counts["asset_specs"] == 11
    assert counts["topo_levels"] > 0
    assert counts["materializations"] == 10
    # a second tick appends materializations (the hourly schedule, ST3)
    counts2 = observe_cycle(spark, "/root/testdata/sf0.001", out)
    assert counts2["materializations"] == 20
    assert counts2["asset_specs"] == 11  # overwrite, not append
