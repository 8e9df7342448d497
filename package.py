"""Build the `--py-files` artifact for cluster submission (north rule:
"the whole pipeline ships via spark-submit --py-files").

The zip is **deterministic**: entries are added in sorted order with a
fixed timestamp, so the same source tree always produces byte-identical
bytes and the printed sha256 can be recorded in lineage manifests — a
resumed job can verify it is running the exact code that wrote the
checkpoint (see plans/manifests.py).

Usage:
    python package.py [--out dist/sedona_db_spark.zip]

prints the artifact path, its sha256, and a ready-to-run spark-submit
command for the reference pipeline job (jobs/pip_pipeline.py).
"""

from __future__ import annotations

import argparse
import hashlib
import os
import zipfile

_REPO = os.path.dirname(os.path.abspath(__file__))


def build_pyfiles_zip(out_path: str, package_dir: str | None = None) -> str:
    """Zip the `sedona_db_spark` package for `spark-submit --py-files`.

    Only `.py` sources are shipped (no tests, no caches). Returns the
    sha256 hex digest of the written artifact.
    """
    pkg = package_dir or os.path.join(_REPO, "sedona_db_spark")
    root = os.path.dirname(pkg)
    entries = []
    for dirpath, dirnames, filenames in os.walk(pkg):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                entries.append((os.path.relpath(full, root), full))
    entries.sort()
    os.makedirs(os.path.dirname(os.path.abspath(out_path)) or ".", exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for arcname, full in entries:
            info = zipfile.ZipInfo(arcname, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            with open(full, "rb") as f:
                zf.writestr(info, f.read())
    h = hashlib.sha256()
    with open(out_path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(_REPO, "dist", "sedona_db_spark.zip"))
    args = ap.parse_args()
    digest = build_pyfiles_zip(args.out)
    print(f"artifact: {args.out}")
    print(f"sha256:   {digest}")
    print(
        "submit:   spark-submit --master local[32] "
        f"--py-files {args.out} {os.path.join(_REPO, 'jobs', 'pip_pipeline.py')} "
        "--sf-dir /root/testdata/sf0.1 --out /tmp/pip_rollup"
    )


if __name__ == "__main__":
    main()
