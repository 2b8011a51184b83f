#!/usr/bin/env python
"""Fetch SuiteSparse (UF) collection matrices for the corpus sweep.

Analog of the reference's get_uf_datasets.sh (downloads the tarballs behind
ufl_urls.txt and flattens them into one directory, get_uf_datasets.sh:1-25).
Instead of shipping a frozen 2,757-entry URL list, this pulls the live
collection index (ssstats.csv) and filters the same way the paper did
(§IV: real/pattern/integer, no complex, no 1-D): the full sweep set is
~4,200 datasets, ~243 GB unpacked (README.md:69).

Usage:
    python tools/get_suitesparse.py --dest DIR [--max-nnz N] [--limit K]
    python tools/get_suitesparse.py --dest DIR --names cant pdb1HYS ...

Requires network access; in air-gapped environments place .mtx files in the
destination directory by other means and run tools/eval_corpus.py directly.
"""

import argparse
import csv
import io
import os
import sys
import tarfile
import urllib.request

INDEX_URL = "https://sparse.tamu.edu/files/ssstats.csv"
TARBALL_URL = "https://suitesparse-collection-website.herokuapp.com/MM/{group}/{name}.tar.gz"


def fetch_index():
    """Collection index rows: (group, name, rows, cols, nnz, ..., kind)."""
    with urllib.request.urlopen(INDEX_URL, timeout=60) as r:
        text = r.read().decode()
    lines = text.splitlines()
    # first two lines: count, date
    rows = []
    for line in csv.reader(io.StringIO("\n".join(lines[2:]))):
        if len(line) < 5:
            continue
        rows.append({
            "group": line[0], "name": line[1],
            "rows": int(line[2]), "cols": int(line[3]), "nnz": int(line[4]),
            "real": line[5] == "1" if len(line) > 5 else True,
            "kind": line[12] if len(line) > 12 else "",
        })
    return rows


def download(group, name, dest):
    url = TARBALL_URL.format(group=group, name=name)
    os.makedirs(dest, exist_ok=True)
    out = os.path.join(dest, f"{name}.mtx")
    if os.path.exists(out):
        return out
    with urllib.request.urlopen(url, timeout=300) as r:
        data = r.read()
    with tarfile.open(fileobj=io.BytesIO(data), mode="r:gz") as tf:
        for member in tf.getmembers():
            # flatten: keep only <name>/<name>.mtx (the primary matrix)
            if member.name.endswith(f"/{name}.mtx"):
                with tf.extractfile(member) as src, open(out, "wb") as dst:
                    dst.write(src.read())
                return out
    raise FileNotFoundError(f"{name}.mtx not in tarball {url}")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dest", required=True)
    ap.add_argument("--max-nnz", type=int, default=None)
    ap.add_argument("--min-nnz", type=int, default=2)
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--names", nargs="*", default=None)
    args = ap.parse_args(argv)

    try:
        index = fetch_index()
    except OSError as e:
        print(f"cannot reach the SuiteSparse index ({e}); are you offline?",
              file=sys.stderr)
        return 1

    picked = []
    for row in index:
        if args.names and row["name"] not in args.names:
            continue
        if row["rows"] < 2 or row["cols"] < 2 or row["nnz"] < args.min_nnz:
            continue   # trivial datasets, skipped like eval_csrmv.sh
        if args.max_nnz and row["nnz"] > args.max_nnz:
            continue
        picked.append(row)
        if args.limit and len(picked) >= args.limit:
            break

    print(f"{len(picked)} datasets selected")
    ok = 0
    for row in picked:
        try:
            path = download(row["group"], row["name"], args.dest)
            ok += 1
            print(f"  {row['name']}: {path}")
        except Exception as e:  # noqa: BLE001 — per-matrix isolation
            print(f"  {row['name']}: FAILED ({e})", file=sys.stderr)
    print(f"downloaded {ok}/{len(picked)}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
