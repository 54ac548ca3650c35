"""North-rule launch shape: ``spark-submit --py-files dist/engine.zip``
must carry the WHOLE engine. The job script is copied outside the repo
and launched with the repo stripped from the import path, so the
package can only come from the zip — the no-shared-filesystem contract
a real multi-executor cluster imposes (executors receive the zip via
SparkContext file distribution, never the driver's working tree)."""

import json
import os
import shutil
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_pyfiles_launch(tmp_path):
    subprocess.run(
        [sys.executable, os.path.join(ROOT, "jobs", "package.py")],
        check=True, cwd=ROOT,
    )
    built = os.path.join(ROOT, "dist", "engine.zip")
    assert os.path.exists(built)
    # engine.zip must hold the package but never tests or caches
    import zipfile
    names = zipfile.ZipFile(built).namelist()
    assert any(n.startswith("intent_classifier_service_spark/") for n in names)
    assert not any("__pycache__" in n or n.startswith("tests") for n in names)

    launch_dir = tmp_path / "launch"
    launch_dir.mkdir()
    shutil.copy(os.path.join(ROOT, "jobs", "validate.py"),
                launch_dir / "validate.py")

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = tmp_path / "out"
    proc = subprocess.run(
        ["spark-submit", "--master", "local[4]",
         "--py-files", built,
         str(launch_dir / "validate.py"),
         "--output", str(out),
         "--checkpoint", str(tmp_path / "ckpt"),
         "--n-docs", "500"],
        cwd=str(launch_dir), env=env,
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert report["n_docs"] == 500 and report["gate_pass"] is True
    assert os.path.isdir(out / "violations")
