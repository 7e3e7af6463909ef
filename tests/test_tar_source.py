"""Tar-archived TSV filesets (kgx/source/tsv_source.py:83-113 tar handling)."""

import tarfile

from kgx_spark.sources.tsv import read_kgx_tsv

NODES = "id\tname\tcategory\nHGNC:1\tg1\tbiolink:Gene\nHGNC:2\tg2\tbiolink:Gene\n"
EDGES = "subject\tpredicate\tobject\nHGNC:1\tbiolink:related_to\tHGNC:2\n"


def test_read_tar_gz(spark, tmp_path):
    src = tmp_path / "files"
    src.mkdir()
    (src / "g_nodes.tsv").write_text(NODES)
    (src / "g_edges.tsv").write_text(EDGES)
    archive = tmp_path / "graph.tar.gz"
    with tarfile.open(archive, "w:gz") as tf:
        tf.add(src / "g_nodes.tsv", arcname="g_nodes.tsv")
        tf.add(src / "g_edges.tsv", arcname="g_edges.tsv")
    nodes, edges = read_kgx_tsv(spark, str(archive))
    assert nodes.count() == 2
    assert edges.count() == 1
