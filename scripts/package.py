"""Build the ``--py-files`` artifact: a deterministic zip of kermit_spark/.

The north rule requires the engine to be "launched via spark-submit
--py-files on multi-executor clusters"; this produces that artifact.

    python scripts/package.py [dist/kermit_spark.zip]

Determinism: entries are added in sorted order with a fixed timestamp so
the artifact hash is a pure function of the source tree (reproducible
deploys; a cluster-side cache can key on the zip's sha256).
"""

from __future__ import annotations

import os
import sys
import zipfile

# fixed timestamp (zip format can't store pre-1980): reproducible builds
_EPOCH = (1980, 1, 1, 0, 0, 0)


def build_zip(repo_root: str, out_path: str) -> str:
    pkg_root = os.path.join(repo_root, "kermit_spark")
    entries = []
    for dirpath, dirnames, filenames in os.walk(pkg_root):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if fn.endswith((".pyc", ".pyo")):
                continue
            full = os.path.join(dirpath, fn)
            arc = os.path.relpath(full, repo_root)
            entries.append((full, arc))
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for full, arc in entries:
            with open(full, "rb") as f:
                data = f.read()
            info = zipfile.ZipInfo(arc, date_time=_EPOCH)
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            zf.writestr(info, data)
    return out_path


if __name__ == "__main__":
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(repo, "dist", "kermit_spark.zip")
    print(build_zip(repo, out))
