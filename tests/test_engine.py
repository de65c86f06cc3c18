

def test_reserve_single_growth(rng):
    """reserve() reaches the target capacity in one growth (bulk-ingest
    pre-sizing; incremental doubling recompiles per step instead)."""
    from radiant_rag_tpu.index.engine import DeviceVectorIndex

    eng = DeviceVectorIndex(32, initial_capacity=256)
    eng.reserve(5000)
    assert eng.capacity == 8192  # next pow2 >= 5000 in ONE step
    v = rng.standard_normal((10, 32)).astype("float32")
    import numpy as np
    rows = eng.append(v, np.zeros(10, np.int8), np.zeros(10, np.int32),
                      np.full(10, 8.0, np.float32))
    assert len(rows) == 10 and eng.count == 10
    eng.reserve(100)  # below capacity: no-op
    assert eng.capacity == 8192
