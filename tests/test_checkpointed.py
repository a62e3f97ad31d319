"""Resume-from-snapshot semantics of the checkpointed pipeline."""

import os

from osmcoastline_spark.plans.checkpointed import run_checkpointed
from osmcoastline_spark.plans.pipeline import Options
from osmcoastline_spark.sinks import CheckpointSink
from osmcoastline_spark.synth import fixture_df

NODES = [
    (100, 1.01, 1.01), (101, 1.02, 1.01), (102, 1.03, 1.02),
    (103, 1.04, 1.02), (104, 1.05, 1.03), (105, 1.01, 1.03),
]
WAYS = [(200, [100, 101, 102]), (201, [102, 103, 104, 105, 100])]


def test_checkpoint_then_resume(spark, tmp_path):
    nodes, ways = fixture_df(spark, NODES, WAYS)
    sink = CheckpointSink(str(tmp_path / "ckpt"))
    opt = Options(output_polygons="land")

    run1 = run_checkpointed(spark, nodes, ways, opt, sink)
    assert run1.loaded == []
    assert any(t == "land_polygons" for t, _ in run1.committed)
    land1 = run1.result.tables["land_polygons"].collect()

    # second run: everything served from snapshots, no recompute
    run2 = run_checkpointed(spark, nodes, ways, opt, sink)
    assert "land_polygons" in run2.loaded
    assert run2.committed == []
    land2 = run2.result.tables["land_polygons"].collect()
    assert {tuple(r.shell_x) for r in land1} == {tuple(r.shell_x) for r in land2}
    assert run2.result.warnings == run1.result.warnings
    assert run2.result.errors == run1.result.errors

    # torn run: missing meta marker ⇒ finals recompute, but the committed
    # rings_closed/rings_open snapshots give a MID-PIPELINE resume (the
    # location join + assembly are skipped)
    os.remove(os.path.join(str(tmp_path / "ckpt"), "_meta_done", "_MANIFEST.json"))
    run3 = run_checkpointed(spark, nodes, ways, opt, sink)
    assert run3.loaded == ["rings_closed", "rings_open"]
    assert any(t == "land_polygons" for t, _ in run3.committed)
    land3 = run3.result.tables["land_polygons"].collect()
    assert {tuple(r.shell_x) for r in land1} == {tuple(r.shell_x) for r in land3}
    assert run3.result.warnings == run1.result.warnings
    assert run3.result.errors == run1.result.errors
    # pre-assembly stats restored from the snapshot lineage
    assert run3.result.stats["ways"] == run1.result.stats["ways"]
    assert (
        run3.result.stats["rings_from_single_way"]
        == run1.result.stats["rings_from_single_way"]
    )

    # fully torn (no mid snapshot either) ⇒ full recompute
    os.remove(os.path.join(str(tmp_path / "ckpt"), "rings_closed", "_MANIFEST.json"))
    os.remove(os.path.join(str(tmp_path / "ckpt"), "_meta_done", "_MANIFEST.json"))
    run4 = run_checkpointed(spark, nodes, ways, opt, sink)
    assert run4.loaded == []
    assert any(t == "land_polygons" for t, _ in run4.committed)
