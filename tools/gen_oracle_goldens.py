"""Regenerate the frozen sf0.01 golden-oracle parquet tables.

These back the `_GOLDEN_ORACLES` entries in __ray_entry__.py: queries
whose values are deterministic but not SQL-expressible (fingerprinting,
simhash pairs, crawl/extract outputs) are value-checked by the driver
against these committed files. Re-run this ONLY when a deliberate
semantic change alters a query's output, then commit the new files.

Usage: python tools/gen_oracle_goldens.py [sf_dir] [query ...]
(no query names = regenerate all golden-oracled queries)
"""

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def _to_table(result) -> pa.Table:
    if isinstance(result, pa.Table):
        return result
    try:  # ray Dataset
        return pa.concat_tables(
            b for b in result.iter_batches(batch_format="pyarrow")
        ).combine_chunks()
    except AttributeError:  # pandas
        return pa.Table.from_pandas(result, preserve_index=False)


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, ignore_reinit_error=True)

    import __ray_entry__ as entrymod

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    out_dir = os.path.join(_REPO, "tests", "golden", "oracle")
    os.makedirs(out_dir, exist_ok=True)
    qs = entrymod.queries()
    for name in entrymod._GOLDEN_ORACLES:
        if only and name not in only:
            continue
        t = _to_table(qs[name](sf_dir))
        path = os.path.join(out_dir, f"{name}.parquet")
        pq.write_table(t, path)
        print(f"{name}: {t.num_rows} rows -> {path}")
    ray.shutdown()


if __name__ == "__main__":
    main()
