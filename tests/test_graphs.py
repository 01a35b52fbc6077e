"""Graph builder tests: shapes, partition structure, normalisation invariants."""
import numpy as np

from tamgcn_tpu.graphs import get_graph, ntu_rgb_d, tools, ucla


def test_ucla_shape_and_partitions():
    g = ucla.Graph()
    assert g.A.shape == (3, 20, 20)
    # partition 0 is the identity (self-link) partition
    np.testing.assert_array_equal(g.A[0], np.eye(20))
    # inward/outward partitions are column-normalised: nonzero columns sum to 1
    for k in (1, 2):
        col = g.A[k].sum(axis=0)
        nz = col > 0
        np.testing.assert_allclose(col[nz], 1.0)
    # 19 bone edges in each directed partition
    assert (g.A[1] > 0).sum() == 19
    assert (g.A[2] > 0).sum() == 19


def test_ntu_shape_and_partitions():
    g = ntu_rgb_d.Graph()
    assert g.A.shape == (3, 25, 25)
    np.testing.assert_array_equal(g.A[0], np.eye(25))
    assert (g.A[1] > 0).sum() == 24


def test_inward_outward_are_transposes_in_support():
    g = ucla.Graph()
    assert ((g.A[1] > 0).astype(int) == (g.A[2] > 0).astype(int).T).all()


def test_registry():
    assert get_graph("ucla").A.shape == (3, 20, 20)
    assert get_graph("graph.ntu_rgb_d.Graph").A.shape == (3, 25, 25)
    try:
        get_graph("nope")
        assert False, "expected KeyError"
    except KeyError:
        pass


def test_normalize_digraph_zero_degree_columns():
    A = np.zeros((4, 4))
    A[1, 0] = 1.0
    out = tools.normalize_digraph(A)
    assert out[1, 0] == 1.0
    assert np.isfinite(out).all()


def test_k_adjacency_and_multiscale():
    g = ucla.Graph()
    A1 = tools.edge2mat(g.inward, 20)
    k2 = tools.k_adjacency(A1, 2)
    assert k2.shape == (20, 20)
    ms = tools.get_multiscale_spatial_graph(20, g.self_link, g.inward, g.outward)
    assert ms.shape == (5, 20, 20)


def test_synthetic_graph_large_v():
    """Round-5: the parametric random-tree graph (scene-graph regime) —
    registry lookup, spatial 3-partition shape, tree structure, and the
    scene256 config's model/feeder/graph wiring agree on V."""
    import numpy as np
    import yaml

    from tamgcn_tpu.data import get_feeder
    from tamgcn_tpu.graphs import get_graph

    g = get_graph("synthetic", num_node=256, seed=3)
    assert g.A.shape == (3, 256, 256)
    assert len(g.inward) == 255  # spanning tree: V-1 edges
    # every non-root vertex has exactly one parent, and parents precede
    # children (acyclic by construction)
    parents = dict((c, p) for c, p in g.inward)
    assert len(parents) == 255 and all(p < c for c, p in parents.items())
    # seeded: same seed -> same tree, different seed -> different tree
    assert get_graph("synthetic", num_node=256, seed=3).inward == g.inward
    assert get_graph("synthetic", num_node=256, seed=4).inward != g.inward
    # identity partition + column-normalised in/out partitions
    np.testing.assert_allclose(g.A[0], np.eye(256))

    with open("configs/scene256.yaml") as f:
        cfg = yaml.safe_load(f)
    v = cfg["model_args"]["num_point"]
    assert cfg["model_args"]["graph_args"]["num_node"] == v
    feeder = get_feeder(cfg["feeder"], **cfg["train_feeder_args"])
    data, _, _ = feeder[0]
    assert data.shape == (3, cfg["train_feeder_args"]["time_steps"], v, 1)
