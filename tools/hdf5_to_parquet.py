#!/usr/bin/env python3
"""One-time HDF5 -> Parquet converter for catalog ingest.

This is the executable form of the conversion route documented by
``graft.sources.Hdf5CatalogSource``: the reference engine opens
opencosmo ``.hdf5`` catalogs directly (reference
src/cosmap/dataset/opencosmo.py:10-32 globs and opens every ``*.hdf5``
under a path); Spark ships no HDF5 DataSource, so the supported route
is converting each HDF5 group of 1-D datasets into a Parquet file the
engine's ParquetCatalogSource reads natively.

Usage:
    python3 tools/hdf5_to_parquet.py INPUT.hdf5 OUTPUT.parquet \
        [--group /path/in/file] [--columns a,b,c] [--row-group-size N]
    python3 tools/hdf5_to_parquet.py INPUT_DIR/ OUTPUT_DIR/ [...]
    python3 tools/hdf5_to_parquet.py --selftest   # requires h5py

Directory mode mirrors the reference's many-file case
(``identify_opencosmo_files``, src/cosmap/dataset/opencosmo.py:57-65:
a single ``.hdf5`` file, or a directory globbed for ``*.hdf5``): every
matched file becomes one ``part-NNNNN-<stem>.parquet`` under
OUTPUT_DIR, schemas are checked for consistency across files, and the
resulting directory is ONE parquet dataset Spark reads natively
(``spark.read.parquet(OUTPUT_DIR)`` — partition-per-file parallelism
comes for free).

Mapping contract (what the engine-side test pins):
  - every 1-D dataset directly under the chosen group becomes a column
    named after the dataset; all must share the same length
  - dtype mapping is the numpy->arrow default (ints/floats/bool keep
    width; fixed/variable strings -> utf8; HDF5 attributes are carried
    as parquet file metadata under ``hdf5.attr.<name>``)
  - rows are written in HDF5 storage order, streamed in row-group-size
    slices so arbitrarily large datasets convert in bounded memory

Requires: h5py + pyarrow. h5py is imported lazily so environments
without HDF5 libs (like this build sandbox) get a clear error instead
of an import crash; pyarrow ships with the driver tooling.
"""

import argparse
import json
import sys
import tempfile


def _require_h5py():
    try:
        import h5py  # noqa: F401
        return h5py
    except ImportError:
        sys.exit(
            "error: h5py is not installed in this environment. "
            "Run this tool wherever the HDF5 data lives (any python with "
            "`pip install h5py pyarrow`); the output parquet is what the "
            "engine ingests."
        )


def convert(input_path, output_path, group="/", columns=None,
            row_group_size=1 << 20):
    h5py = _require_h5py()
    import pyarrow as pa
    import pyarrow.parquet as pq

    with h5py.File(input_path, "r") as f:
        g = f[group]
        names = [
            k for k, v in g.items()
            if isinstance(v, h5py.Dataset) and v.ndim == 1
        ]
        if columns:
            missing = sorted(set(columns) - set(names))
            if missing:
                sys.exit(f"error: columns not found in {group}: {missing}")
            names = [n for n in names if n in set(columns)]
        if not names:
            sys.exit(f"error: no 1-D datasets under group '{group}'")
        lengths = {n: g[n].shape[0] for n in names}
        if len(set(lengths.values())) != 1:
            sys.exit(f"error: column lengths differ: {lengths}")
        n_rows = next(iter(lengths.values()))

        # attributes -> parquet key-value metadata
        meta = {
            f"hdf5.attr.{k}": json.dumps(
                v.tolist() if hasattr(v, "tolist") else v, default=str
            )
            for k, v in g.attrs.items()
        }

        def to_arrow(chunk):
            # bytes (fixed-width HDF5 strings) -> utf8
            if chunk.dtype.kind == "S":
                return pa.array([b.decode("utf-8") for b in chunk],
                                type=pa.string())
            if chunk.dtype.kind == "O":
                return pa.array(
                    [b.decode("utf-8") if isinstance(b, bytes) else b
                     for b in chunk],
                    type=pa.string())
            return pa.array(chunk)

        first = pa.table(
            {n: to_arrow(g[n][0:min(1, n_rows)]) for n in names})
        schema = first.schema.with_metadata(meta)
        writer = pq.ParquetWriter(output_path, schema)
        try:
            for start in range(0, n_rows, row_group_size):
                stop = min(start + row_group_size, n_rows)
                batch = pa.table(
                    {n: to_arrow(g[n][start:stop]) for n in names},
                    schema=pa.schema(
                        [schema.field(i) for i in range(len(schema))]),
                )
                writer.write_table(batch)
        finally:
            writer.close()
    return n_rows, names


def identify_hdf5_files(path):
    """Mirror of the reference's identify_opencosmo_files
    (src/cosmap/dataset/opencosmo.py:57-65): a single .hdf5 file, or a
    directory globbed for *.hdf5 (sorted for a stable part order)."""
    import pathlib

    p = pathlib.Path(path)
    if p.exists() and p.is_file() and p.suffix == ".hdf5":
        return [p]
    if p.exists() and p.is_dir():
        files = sorted(p.glob("*.hdf5"))
        if files:
            return files
    sys.exit(f"error: unable to identify hdf5 files at path {path}")


def convert_many(input_dir, output_dir, group="/", columns=None,
                 row_group_size=1 << 20):
    """Directory mode: each *.hdf5 under input_dir -> one parquet part
    file under output_dir; schema consistency enforced across files."""
    import os

    files = identify_hdf5_files(input_dir)
    os.makedirs(output_dir, exist_ok=True)
    total, ref_cols = 0, None
    for i, f in enumerate(files):
        out = os.path.join(output_dir, f"part-{i:05d}-{f.stem}.parquet")
        n, names = convert(str(f), out, group, columns, row_group_size)
        if ref_cols is None:
            ref_cols = names
        elif set(names) != set(ref_cols):
            sys.exit(
                f"error: schema mismatch in {f.name}: {sorted(names)} "
                f"vs {sorted(ref_cols)} in {files[0].name}")
        total += n
    return total, ref_cols, len(files)


def selftest():
    """Create a tiny fixture, convert it, verify the round-trip."""
    h5py = _require_h5py()
    import numpy as np
    import pyarrow.parquet as pq

    with tempfile.TemporaryDirectory() as d:
        src = f"{d}/fixture.hdf5"
        dst = f"{d}/fixture.parquet"
        with h5py.File(src, "w") as f:
            g = f.create_group("catalog")
            g.create_dataset("object_id", data=np.arange(1000, dtype="i8"))
            g.create_dataset("ra", data=np.linspace(31.0, 38.0, 1000))
            g.create_dataset("dec", data=np.linspace(-11.0, -4.0, 1000))
            g.create_dataset(
                "tag", data=np.array([b"a", b"b"] * 500, dtype="S1"))
            g.attrs["survey"] = "selftest"
        n, cols = convert(src, dst, group="/catalog")
        t = pq.read_table(dst)
        assert t.num_rows == n == 1000, t.num_rows
        assert set(t.column_names) == {"object_id", "ra", "dec", "tag"}
        assert t.column("ra")[0].as_py() == 31.0
        assert t.column("tag")[1].as_py() == "b"
        assert b"hdf5.attr.survey" in (t.schema.metadata or {})
        print("selftest OK: 1000 rows, columns", sorted(cols))

        # directory mode: 3 shard files -> one parquet dataset dir
        import os

        shard_dir = f"{d}/shards"
        out_dir = f"{d}/dataset"
        os.makedirs(shard_dir)
        for s in range(3):
            with h5py.File(f"{shard_dir}/shard_{s}.hdf5", "w") as f:
                g = f.create_group("catalog")
                base = s * 100
                g.create_dataset(
                    "object_id", data=np.arange(base, base + 100, dtype="i8"))
                g.create_dataset(
                    "ra", data=np.linspace(30.0 + s, 31.0 + s, 100))
                g.create_dataset(
                    "dec", data=np.linspace(-11.0, -10.0, 100))
        total, cols2, nfiles = convert_many(shard_dir, out_dir,
                                            group="/catalog")
        td = pq.read_table(out_dir)
        assert nfiles == 3 and total == 300 and td.num_rows == 300
        assert set(td.column_names) == {"object_id", "ra", "dec"}
        ids = sorted(td.column("object_id").to_pylist())
        assert ids == list(range(300))
        print("selftest OK: directory mode, 3 shards -> 300-row dataset")


def main():
    ap = argparse.ArgumentParser(
        description="Convert an HDF5 group of 1-D datasets to Parquet")
    ap.add_argument("input", nargs="?", help="input .hdf5 file")
    ap.add_argument("output", nargs="?", help="output .parquet file")
    ap.add_argument("--group", default="/", help="HDF5 group to read")
    ap.add_argument("--columns", default=None,
                    help="comma-separated dataset names (default: all 1-D)")
    ap.add_argument("--row-group-size", type=int, default=1 << 20)
    ap.add_argument("--selftest", action="store_true",
                    help="create a fixture, convert, verify (needs h5py)")
    args = ap.parse_args()
    if args.selftest:
        selftest()
        return
    if not args.input or not args.output:
        ap.error("input and output are required (or --selftest)")
    cols = args.columns.split(",") if args.columns else None
    import os

    if os.path.isdir(args.input):
        n, names, k = convert_many(args.input, args.output, args.group,
                                   cols, args.row_group_size)
        print(f"wrote {n} rows x {len(names)} columns "
              f"({k} part files) to {args.output}")
    else:
        n, names = convert(args.input, args.output, args.group, cols,
                           args.row_group_size)
        print(f"wrote {n} rows x {len(names)} columns to {args.output}")


if __name__ == "__main__":
    main()
