"""Build engine.zip for spark-submit --py-files (north rule launch shape):

    python jobs/package.py            # writes dist/engine.zip
    spark-submit --py-files dist/engine.zip jobs/validate.py --output ...

Zips the intent_classifier_service_spark package (no tests, no caches)
so executors can import the engine without a shared filesystem.
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "intent_classifier_service_spark"


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(ROOT, "dist", "engine.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, dirnames, filenames in os.walk(os.path.join(ROOT, PKG)):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for f in filenames:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, ROOT))
    return out_path


if __name__ == "__main__":
    print(build())
