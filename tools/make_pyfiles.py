"""Build the ``--py-files`` archive for spark-submit.

The north rule ships the engine to a multi-executor cluster via
``spark-submit --py-files``: the driver script (jobs/extract_job.py)
stays outside the package, and this zip carries the whole
``indonesian_id_ocr_service_spark`` package so executors resolve the
Arrow kernels / dictionaries without any shared filesystem.

Deterministic on purpose (sorted entries, fixed timestamps, no .pyc):
re-running on an unchanged tree yields a byte-identical archive, so a
cluster deploy can content-address / cache it.

Usage: python tools/make_pyfiles.py [out_zip]
Prints the archive path on success.
"""

from __future__ import annotations

import os
import sys
import zipfile

PKG = "indonesian_id_ocr_service_spark"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Fixed DOS timestamp (zip epoch floor): determinism beats mtime here.
_STAMP = (1980, 1, 1, 0, 0, 0)


def build(out_zip: str | None = None) -> str:
    out_zip = out_zip or os.path.join(REPO, "dist", f"{PKG}.zip")
    os.makedirs(os.path.dirname(out_zip), exist_ok=True)
    pkg_root = os.path.join(REPO, PKG)
    entries = []
    for dirpath, dirnames, filenames in os.walk(pkg_root):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if not fn.endswith(".py"):
                continue
            full = os.path.join(dirpath, fn)
            arc = os.path.relpath(full, REPO)
            entries.append((arc, full))
    tmp = out_zip + ".tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
        for arc, full in entries:
            with open(full, "rb") as f:
                data = f.read()
            info = zipfile.ZipInfo(arc, date_time=_STAMP)
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            zf.writestr(info, data)
    os.replace(tmp, out_zip)
    return out_zip


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
