import numpy as np

from kaiju_tpu.io.taxonomy import (
    Taxonomy,
    parse_names_dmp,
    parse_nodes_dmp,
    parse_nodes_dmp_with_rank,
)

from conftest import write_names_dmp, write_nodes_dmp


def test_parse_and_lca(tmp_path):
    nodes_path = str(tmp_path / "nodes.dmp")
    edges = write_nodes_dmp(nodes_path)
    nodes = parse_nodes_dmp(nodes_path)
    assert nodes == edges

    tax = Taxonomy(nodes)
    assert tax.lca([101]) == 101
    assert tax.lca([101, 102]) == 100
    assert tax.lca([101, 201]) == 10
    assert tax.lca([101, 102, 103]) == 100
    assert tax.lca([101, 301]) == 10
    # unknown ids are dropped (reference: util.cpp:205-209)
    assert tax.lca([101, 999999]) == 101
    assert tax.lca([999999, 888888]) == 0
    # LCA at different depths (lift-to-shallowest)
    assert tax.lca([100, 101]) == 100
    assert tax.lca([10, 301]) == 10

    assert tax.is_ancestor(10, 101)
    assert tax.is_ancestor(101, 101)
    assert not tax.is_ancestor(101, 10)
    assert not tax.is_ancestor(200, 101)


def test_ranks_and_names(tmp_path):
    nodes_path = str(tmp_path / "nodes.dmp")
    names_path = str(tmp_path / "names.dmp")
    write_nodes_dmp(nodes_path)
    expected_names = write_names_dmp(names_path)
    nodes, ranks = parse_nodes_dmp_with_rank(nodes_path)
    assert ranks[101] == "species"
    assert ranks[100] == "genus"
    assert ranks[1] == "no rank"
    names = parse_names_dmp(names_path)
    assert names == expected_names


def test_dense_arrays(tmp_path):
    nodes_path = str(tmp_path / "nodes.dmp")
    write_nodes_dmp(nodes_path)
    tax = Taxonomy(parse_nodes_dmp(nodes_path))
    parent, depth = tax.dense_arrays()
    assert parent[101] == 100 and parent[100] == 10 and parent[1] == 1
    assert depth[1] == 1 and depth[10] == 2 and depth[101] == 4
    assert parent[55] == 0 and depth[55] == 0  # absent taxid
