import jax
import jax.numpy as jnp
import numpy as np

from recommendations_tpu.nn import (
    CosineVectorEmbedding,
    SimhashVectorIndexer,
    QuantileMapper,
    CosineLinear,
    LearnableCosineVectorEmbedding,
    ProbabilityVectorEmbedding,
    init_logq_state,
    logq_update,
    logq_correction,
)
from recommendations_tpu.nn.functional import l2_normalize


def test_cosine_vector_embedding_oracle():
    """EmbeddingBag(sum) over per-projection bucket rows (reference
    transformers/layers.py:443-471)."""
    # f32 compute for a bit-tight oracle; prod default is bf16 operands
    mod = CosineVectorEmbedding(inp_dim=8, features=6, n_proj=4, num_bins=5,
                                compute_dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 8))
    vs = mod.init(jax.random.PRNGKey(0), x)
    out = np.asarray(mod.apply(vs, x))

    proj = np.asarray(vs["constants"]["projection_mat"])
    table = np.asarray(vs["params"]["embedding"])
    xn = np.asarray(l2_normalize(x))
    z = xn @ proj
    res = 2.0 / 5
    grid = np.linspace(-1, 1, 6)[:-1] + 0.5 * res
    buckets = np.searchsorted(grid, z, side="left")
    offsets = 6 * np.arange(4)
    want = table[buckets + offsets].sum(axis=-2)
    np.testing.assert_allclose(out, want, rtol=1e-4)
    # projections are unit-norm per column
    np.testing.assert_allclose(np.linalg.norm(proj, axis=0), 1.0, rtol=1e-5)


def test_simhash_bits():
    mod = SimhashVectorIndexer(inp_dim=8, n_proj=10)
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 8))
    vs = mod.init(jax.random.PRNGKey(0), x)
    out = np.asarray(mod.apply(vs, x))
    proj = np.asarray(vs["constants"]["projection_mat"])
    z = (np.asarray(x) @ proj) > 0
    want = sum(z[:, i].astype(np.int64) << i for i in range(10))
    np.testing.assert_array_equal(out, want)


def test_quantile_mapper():
    qm = QuantileMapper(quantiles=(1.0, 2.0, 3.0))
    x = jnp.asarray([0.5, 1.5, 2.5, 10.0])
    out = np.asarray(qm(x))
    np.testing.assert_allclose(out, np.asarray([0, 1, 2, 3]) / 4 - 0.5)


def test_cosine_linear_bounded():
    mod = CosineLinear(out_dim=4)
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 8)) * 100
    vs = mod.init(jax.random.PRNGKey(0), x)
    out = np.asarray(mod.apply(vs, x))
    assert np.abs(out).max() <= 1.0 + 1e-5


def test_learnable_cosine_and_probability_embeddings():
    m1 = LearnableCosineVectorEmbedding(inp_dim=8, features=6, n_proj=4, num_bins=5, top_k=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 8))
    vs = m1.init(jax.random.PRNGKey(0), x)
    assert m1.apply(vs, x).shape == (2, 3, 6)

    m2 = ProbabilityVectorEmbedding(features=6, num_bins=5, top_k=2)
    p = jax.random.uniform(jax.random.PRNGKey(1), (4, 1))
    vs2 = m2.init(jax.random.PRNGKey(0), p)
    assert m2.apply(vs2, p).shape == (4, 6)


def test_logq_streaming_estimator():
    """Items seen every batch → gap 1 → b → 1 → logQ → 0 ≈ log p (p=1).
    Items seen every 4th batch → b → 4 → logQ → -log 4 (reference
    commons/layers.py:189-213 EMA semantics)."""
    state = init_logq_state(num_buckets=64, hash_offsets=[0, 17], p_init=0.5)
    common = jnp.asarray([3], dtype=jnp.int64)
    rare = jnp.asarray([11], dtype=jnp.int64)
    valid = jnp.asarray([True])
    for i in range(1, 200):
        state = logq_update(state, common, valid, i, alpha=0.25)
        if i % 4 == 0:
            state = logq_update(state, rare, valid, i, alpha=0.25)
    lc = float(logq_correction(state, common)[0])
    lr = float(logq_correction(state, rare)[0])
    assert abs(lc - 0.0) < 0.05           # -log(1)
    assert abs(lr - (-np.log(4))) < 0.1   # -log(4)


def test_logq_update_respects_valid_mask():
    state = init_logq_state(num_buckets=16, hash_offsets=[0], p_init=0.01)
    ids = jnp.asarray([5, 6], dtype=jnp.int64)
    state2 = logq_update(state, ids, jnp.asarray([True, False]), 1)
    b = np.asarray(state2.b[0])
    assert b[5] != 100.0  # updated
    assert b[6] == 100.0  # masked out


def test_logq_cascade_takes_min():
    state = init_logq_state(num_buckets=8, hash_offsets=[0, 1], p_init=1.0)
    # bucket for id 0 under offset 0 is 0; under offset 1 is 1
    state = state._replace(b=state.b.at[0, 0].set(2.0).at[1, 1].set(8.0))
    out = float(logq_correction(state, jnp.asarray([0], dtype=jnp.int64))[0])
    assert abs(out - (-np.log(2.0))) < 1e-6
