"""spark-submit entry (globalign_spark/main.py) driven in-process."""

import json


def test_main_pipeline_and_resume(spark, tmp_path, capsys):
    from globalign_spark import main as main_mod

    wh = tmp_path / "wh"
    argv = [
        "--warehouse", str(wh),
        "--n-entities", "120",
        "--evaluate",
        "--master", "local[4]",
    ]
    assert main_mod.main(argv) == 0
    out = capsys.readouterr().out
    summary = json.loads(out[out.index("{"):])
    assert summary["eval"]["f1"] >= 0.99
    assert set(summary["stages"]) == {
        "s0_normalized", "s1_signatures", "s0b_rep_map", "s1_candidates",
        "s3_scores", "s4_edges", "s4b_rescue_edges", "s5_components",
    }
    # second run resumes: all stage manifests reused
    assert main_mod.main(argv) == 0
    out2 = capsys.readouterr().out
    summary2 = json.loads(out2[out2.index("{"):])
    assert summary2["stages"] == summary["stages"]
