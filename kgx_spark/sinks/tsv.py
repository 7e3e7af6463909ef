"""KGX TSV sink.

Reference: kgx/sink/tsv_sink.py:39-238 — writes `{base}_nodes.tsv` /
`{base}_edges.tsv`, deterministic column order (core-first, then sorted,
'_'-internal last — 162-238), '|'-joined lists, optional tar packaging.

Spark writes a directory of part files per table (the distributed analogue
of one file); `single_file=True` coalesces to 1 partition for small outputs
and exact golden-file comparison.
"""

from __future__ import annotations

import glob
import os
import shutil
import tarfile
import tempfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgx_spark.operators.sanitize import _qcol, sanitize_export
from kgx_spark.schema import EDGE_CORE_ORDER, NODE_CORE_ORDER, ordered_columns


def _select_declared(df: DataFrame, properties, core_order: list[str]) -> DataFrame:
    """Declared-property-set semantics (tsv_sink.py:82-92,104-141): the
    output columns are exactly the ordered declared set — record keys
    outside it are dropped, declared-but-absent columns fill empty."""
    declared = ordered_columns(sorted(set(properties)), core_order)
    have = set(df.columns)
    return df.select(
        *[
            (_qcol(c) if c in have else F.lit(None).cast("string")).alias(c)
            for c in declared
        ]
    )


def _write(
    df: DataFrame,
    path: str,
    core_order: list[str],
    fmt: str,
    single_file: bool,
    properties=None,
) -> None:
    if properties is not None:
        out = sanitize_export(_select_declared(df, properties, core_order))
    else:
        cols = ordered_columns(df.columns, core_order)
        # quoted refs: undeclared long-tail headers may carry dots (obo IRIs)
        out = sanitize_export(df.select(*[_qcol(c).alias(c) for c in cols]))
    if single_file:
        out = out.coalesce(1)
    (
        out.write.mode("overwrite")
        .option("header", "true")
        .option("sep", "\t" if fmt == "tsv" else ",")
        .option("emptyValue", "")
        .option("nullValue", "")
        .csv(path)
    )


def write_kgx_tsv(
    nodes: DataFrame | None,
    edges: DataFrame | None,
    base_path: str,
    fmt: str = "tsv",
    single_file: bool = False,
    compression: str | None = None,
    node_properties=None,
    edge_properties=None,
) -> None:
    """Write `{base}_nodes.{fmt}` / `{base}_edges.{fmt}`; with
    ``compression`` in {'tar', 'tar.gz', 'tar.bz2'}, package both tables into
    `{base}.{compression}` with `{basename}_nodes.{fmt}` member names
    (kgx/sink/tsv_sink.py:110-160 finalize). ``node_properties`` /
    ``edge_properties`` pin the output column set to the declared properties
    (tsv_sink.py:82-92)."""
    if compression in ("tar", "tar.gz", "tar.bz2"):
        _write_tar(nodes, edges, base_path, fmt, compression)
        return
    if nodes is not None:
        _write(nodes, os.path.join(base_path + f"_nodes.{fmt}"), NODE_CORE_ORDER,
               fmt, single_file, properties=node_properties)
    if edges is not None:
        _write(edges, os.path.join(base_path + f"_edges.{fmt}"), EDGE_CORE_ORDER,
               fmt, single_file, properties=edge_properties)


def _write_tar(
    nodes: DataFrame | None,
    edges: DataFrame | None,
    base_path: str,
    fmt: str,
    compression: str,
) -> None:
    """Tar/tar.gz/tar.bz2 packaging (tsv_sink.py:39-238).

    An archive is a single sequential file, so packaging is inherently a
    driver-side finalization: each table is written single-file (the
    reference is single-file by construction), then the two part files are
    added under the reference's member names. Production jobs wanting
    distributed output use the plain directory mode; tar mode exists for
    drop-in interchange with reference tooling.
    """
    mode = {"tar": "w", "tar.gz": "w:gz", "tar.bz2": "w:bz2"}[compression]
    basename = os.path.basename(base_path)
    tmp = tempfile.mkdtemp(prefix="kgx_tsv_tar_")
    try:
        members: list[tuple[str, str]] = []
        for df, kind in ((nodes, "nodes"), (edges, "edges")):
            if df is None:
                continue
            outdir = os.path.join(tmp, kind)
            _write(df, outdir, NODE_CORE_ORDER if kind == "nodes" else EDGE_CORE_ORDER, fmt, True)
            (part,) = glob.glob(os.path.join(outdir, "part-*"))
            members.append((part, f"{basename}_{kind}.{fmt}"))
        archive = f"{base_path}.{compression}"
        with tarfile.open(archive, mode) as tf:
            for part, name in members:
                tf.add(part, arcname=name)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
