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
    python3 tools/hdf5_to_parquet.py --selftest   # requires h5py

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
    n, names = convert(args.input, args.output, args.group, cols,
                       args.row_group_size)
    print(f"wrote {n} rows x {len(names)} columns to {args.output}")


if __name__ == "__main__":
    main()
