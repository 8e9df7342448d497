"""spark-submit --py-files packaging gate (north rule: the pipeline ships
as a zip artifact to a cluster whose executors never see the checkout).

Runs the real `spark-submit` binary in a scratch CWD with the repo
stripped from PYTHONPATH, so the only way `sedona_db_spark` can resolve —
on the driver AND inside the pandas-UDF python workers — is through the
shipped zip."""

import os
import shutil
import subprocess
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.001"


def test_pyfiles_zip_deterministic(tmp_path):
    from package import build_pyfiles_zip

    d1 = build_pyfiles_zip(str(tmp_path / "a.zip"))
    d2 = build_pyfiles_zip(str(tmp_path / "b.zip"))
    assert d1 == d2
    assert (tmp_path / "a.zip").read_bytes() == (tmp_path / "b.zip").read_bytes()
    names = zipfile.ZipFile(tmp_path / "a.zip").namelist()
    assert "sedona_db_spark/__init__.py" in names
    assert "sedona_db_spark/operators/spatial_join.py" in names
    assert not any("test" in n or "__pycache__" in n for n in names)


@pytest.mark.skipif(shutil.which("spark-submit") is None,
                    reason="spark-submit binary not on PATH")
@pytest.mark.skipif(not os.path.exists(SF_DIR), reason="driver testdata absent")
def test_spark_submit_pyfiles_end_to_end(tmp_path):
    from package import build_pyfiles_zip

    zip_path = str(tmp_path / "sedona_db_spark.zip")
    build_pyfiles_zip(zip_path)
    out_dir = str(tmp_path / "rollup")

    env = dict(os.environ)
    # strip the repo from every import path the subprocess could inherit;
    # the zip must be the sole provider of the package
    env["PYTHONPATH"] = ""
    env.pop("SPARK_GRAFT_SF_DIR", None)

    proc = subprocess.run(
        [
            "spark-submit", "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.ui.showConsoleProgress=false",
            "--py-files", zip_path,
            os.path.join(REPO, "jobs", "pip_pipeline.py"),
            "--sf-dir", SF_DIR, "--out", out_dir,
        ],
        cwd=str(tmp_path),  # neutral CWD: no accidental repo-relative import
        env=env, capture_output=True, text=True, timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    # every sf0.001 customer point lands in exactly one of the 25 boxes
    # that partition the world (interior-only by construction)
    assert "PIP_ROLLUP_TOTAL=150" in proc.stdout
    assert os.path.isdir(out_dir)
