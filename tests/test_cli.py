"""The spark-submit driver (__main__.main), exercised in-process: fit with
checkpoints → transform from saved artifacts → PIT end-to-end."""

import json

from msi_preprocessing_pipeline_spark.__main__ import main
from msi_preprocessing_pipeline_spark.sources import synthetic


def test_cli_fit_transform_pit(spark, tmp_path, capsys):
    df = synthetic.sequences_df(spark, {"src-000": 10, "src-001": 10},
                                base_channels=512)
    in_dir = str(tmp_path / "seq")
    df.write.parquet(in_dir)
    work = str(tmp_path / "work")
    art_path = str(tmp_path / "art.json")

    assert main(["fit", "--input", in_dir, "--work-dir", work,
                 "--artifacts", art_path,
                 "--sources", "src-000,src-001",
                 "--base-channels", "512"]) == 0
    fit_out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert fit_out["features"] > 0

    out_dir = str(tmp_path / "feats")
    assert main(["transform", "--input", in_dir, "--artifacts", art_path,
                 "--output", out_dir, "--sources", "src-000,src-001",
                 "--base-channels", "512"]) == 0
    tr_out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert tr_out["rows"] == 20

    pit_dir = str(tmp_path / "pit")
    assert main(["pit", "--input", in_dir, "--output", pit_dir,
                 "--checkpoints", "1600000000,1600000300",
                 "--sources", "src-000,src-001",
                 "--base-channels", "512"]) == 0
    pit_out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert pit_out["rows"] == 20 and pit_out["versions"] == 2
