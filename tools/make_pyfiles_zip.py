"""Build the --py-files archive for spark-submit deployment.

    python tools/make_pyfiles_zip.py [dist/mee_spark_pyfiles.zip]

Zips the engine package (pure Python — no build step) with the package
directory at the archive root, which is the layout ``--py-files`` prepends
to ``sys.path`` on the driver and every executor.  Deterministic output:
entries are sorted and timestamps zeroed, so re-building an unchanged tree
yields a byte-identical archive (content-addressable deploy artifacts).
"""

from __future__ import annotations

import os
import sys
import zipfile

PACKAGE = "military_entity_extraction_based_on_large_models_spark"


def build(out_path: str, repo_root: str | None = None) -> str:
    root = repo_root or os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg_dir = os.path.join(root, PACKAGE)
    entries = []
    for dirpath, dirnames, filenames in os.walk(pkg_dir):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                entries.append((full, os.path.relpath(full, root)))
    os.makedirs(os.path.dirname(os.path.abspath(out_path)) or ".", exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for full, arcname in entries:
            with open(full, "rb") as fh:
                data = fh.read()
            info = zipfile.ZipInfo(arcname, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(info, data)
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "dist/mee_spark_pyfiles.zip"
    print(build(out))
