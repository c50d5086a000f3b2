import numpy as np

from anemoi_models_tpu.graphs.khop import get_k_hop_edges, sort_edges_1hop_chunks


def test_k_hop_edges_chain():
    # 0 -> 1 -> 2 -> 3
    ei = np.array([[0, 1, 2], [1, 2, 3]])
    one = get_k_hop_edges(ei, 4, 1)
    assert one.shape[1] == 3
    two = get_k_hop_edges(ei, 4, 2)
    pairs = set(zip(two[0].tolist(), two[1].tolist()))
    assert (0, 2) in pairs and (1, 3) in pairs and (0, 3) not in pairs
    three = get_k_hop_edges(ei, 4, 3)
    assert (0, 3) in set(zip(three[0].tolist(), three[1].tolist()))
    # CSR sorted
    assert np.all(np.diff(two[1]) >= 0)


def test_sort_edges_1hop_chunks_partition():
    rng = np.random.RandomState(0)
    dst = np.sort(rng.randint(0, 50, 300))
    src = rng.randint(0, 50, 300)
    ei = np.stack([src, dst])
    chunks = sort_edges_1hop_chunks(ei, 50, 4)
    # disjoint cover
    allidx = np.concatenate(chunks)
    assert sorted(allidx.tolist()) == list(range(300))
    # destination ranges disjoint between chunks
    seen = set()
    for c in chunks:
        dsts = set(dst[c].tolist())
        assert seen.isdisjoint(dsts)
        seen |= dsts
