"""Offline KShift embedding compression job.

JAX rebuild of reference ``embedding_module_gen.py``: distill a pretrained
product-embedding table (parquet: ``product_id`` strings + embedding arrays)
into a hash-based parameter-shared module:

1. hash ids with the training-time contract (xxh64(product_id-seed) - 2^63,
   reference ``:53-66``)
2. train ``KShiftEmbedding(expansion_factor*N, dim, k)`` to reconstruct the
   L2-normalized embeddings (MSE, Adagrad — reference ``:122-156``)
3. train a mask model (KShift(k=4) → MLP → sigmoid) to classify known vs
   random ids (BCE — reference ``:70-118``)
4. save ``{emb_table, mask_table, mask_w1/b1/w2/b2}`` as an Orbax artifact
   that ``models/lthm/pretrained.PretrainedProductEmbedding`` loads into its
   frozen ``constants`` collection (replaces the TorchScripted mask*emb
   module, reference ``:32-41,188-197``)

The whole optimization runs on the TPU with jit-compiled steps.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from recommendations_tpu.features.hashing import (
    hash_feature_name_to_int,
    hash_strings_to_long,
)
from recommendations_tpu.nn.embeddings import KShiftEmbedding, kshift_row_indices
from recommendations_tpu.nn.functional import l2_normalize, quick_gelu

logger = logging.getLogger(__name__)
MAX_LONG = 2**63


def massage_embeddings(df, id_column: str = "product_id", emb_column: str = "emb_128", dim: int = 32):
    """parquet frame → (hashed int64 ids, float32 embeddings[:, :dim])."""
    seed = hash_feature_name_to_int(id_column)
    ids = hash_strings_to_long(
        [str(v) for v in df[id_column].values], seed, value_to_lower=False
    )
    embs = np.stack([np.asarray(e)[:dim] for e in df[emb_column].values]).astype(
        np.float32
    )
    return ids, embs


def train_reconstruction(
    ids: np.ndarray,
    embs: np.ndarray,
    expansion_factor: float = 1.15,
    k_shift: int = 16,
    num_epochs: int = 50,
    batch_size: int = 2**16,
    lr: float = 0.5,
    seed: int = 0,
) -> Dict[str, np.ndarray]:
    """KShift table ← MSE against L2-normalized targets (reference :122-156)."""
    n, dim = embs.shape
    num_rows = int(expansion_factor * n)
    target = np.asarray(l2_normalize(jnp.asarray(embs)))
    model = KShiftEmbedding(
        num_embeddings=num_rows, features=dim, num_shifts=k_shift,
        normalize_output=True,
    )
    vs = model.init(jax.random.PRNGKey(seed), jnp.asarray(ids[:2]))
    params = vs["params"]
    tx = optax.adagrad(lr, initial_accumulator_value=1e-10)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, batch_ids, batch_target):
        def loss_fn(p):
            pred = model.apply({"params": p}, batch_ids)
            return jnp.mean((pred - batch_target) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(params)
        u, o2 = tx.update(g, opt_state, params)
        return optax.apply_updates(params, u), o2, loss

    rng = np.random.RandomState(seed)
    num_batches = (n + batch_size - 1) // batch_size
    for epoch in range(num_epochs):
        order = rng.permutation(n)
        last = None
        for b in range(num_batches):
            sl = order[b * batch_size : (b + 1) * batch_size]
            if len(sl) < batch_size:  # pad to fixed shape
                sl = np.concatenate([sl, sl[: batch_size - len(sl)]])
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(ids[sl]), jnp.asarray(target[sl])
            )
            last = float(loss)
        if epoch % max(1, num_epochs // 10) == 0:
            logger.info("recon epoch %d/%d loss %.5f", epoch, num_epochs, last)
    return {"emb_table": np.asarray(params["embedding"])}


def train_mask_model(
    ids: np.ndarray,
    expansion_factor: float = 1.15,
    mask_emb_dim: int = 4,
    mask_hidden: int = 64,
    num_epochs: int = 20,
    batch_size: int = 2**15,
    lr: float = 0.5,
    seed: int = 1,
) -> Dict[str, np.ndarray]:
    """known-vs-random id classifier: KShift(k=4) → MLP → sigmoid
    (reference :70-118; hidden = mask_emb_dim*16 there, configurable here)."""
    n = len(ids)
    num_rows = int(expansion_factor * n)
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    params = {
        "mask_table": jax.random.normal(k1, (num_rows, mask_emb_dim), jnp.float32),
        "mask_w1": jax.random.normal(k2, (mask_emb_dim, mask_hidden)) / np.sqrt(mask_emb_dim),
        "mask_b1": jnp.zeros((mask_hidden,)),
        "mask_w2": jax.random.normal(k3, (mask_hidden, 1)) / np.sqrt(mask_hidden),
        "mask_b2": jnp.zeros((1,)),
    }
    tx = optax.adagrad(lr, initial_accumulator_value=1e-10)
    opt_state = tx.init(params)

    def fwd(p, x):
        idx = kshift_row_indices(x, num_rows, 4)
        m = jnp.take(p["mask_table"], idx.astype(jnp.int32), axis=0).sum(-2) / 2.0
        h = quick_gelu(m @ p["mask_w1"] + p["mask_b1"])
        return (h @ p["mask_w2"] + p["mask_b2"])[..., 0]

    @jax.jit
    def step(params, opt_state, pos_ids, neg_ids):
        x = jnp.concatenate([pos_ids, neg_ids])
        y = jnp.concatenate(
            [jnp.ones_like(pos_ids, jnp.float32), jnp.zeros_like(neg_ids, jnp.float32)]
        )

        def loss_fn(p):
            return jnp.mean(optax.sigmoid_binary_cross_entropy(fwd(p, x), y))

        loss, g = jax.value_and_grad(loss_fn)(params)
        u, o2 = tx.update(g, opt_state, params)
        return optax.apply_updates(params, u), o2, loss

    rng = np.random.RandomState(seed)
    num_batches = (n + batch_size - 1) // batch_size
    for epoch in range(num_epochs):
        order = rng.permutation(n)
        last = None
        for b in range(num_batches):
            sl = order[b * batch_size : (b + 1) * batch_size]
            if len(sl) < batch_size:
                sl = np.concatenate([sl, sl[: batch_size - len(sl)]])
            neg = rng.randint(-MAX_LONG, MAX_LONG - 1, size=batch_size, dtype=np.int64)
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(ids[sl]), jnp.asarray(neg)
            )
            last = float(loss)
        if epoch % max(1, num_epochs // 5) == 0:
            logger.info("mask epoch %d/%d loss %.5f", epoch, num_epochs, last)
    return {k: np.asarray(v) for k, v in params.items()}


def save_artifact(artifact: Dict[str, np.ndarray], directory: str, meta: Optional[dict] = None) -> None:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(os.path.abspath(directory), "embedding_module"), artifact)
    ckptr.wait_until_finished()
    if meta:
        import json

        with open(os.path.join(directory, "embedding_module_meta.json"), "w") as f:
            json.dump(meta, f, indent=2)


def load_artifact(directory: str) -> Dict[str, np.ndarray]:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.join(os.path.abspath(directory), "embedding_module"))


def execute(
    input_parquet: str,
    output_dir: str,
    dim: int = 32,
    expansion_factor: float = 1.15,
    k_shift: int = 16,
    recon_epochs: int = 50,
    mask_epochs: int = 20,
) -> None:
    import pandas as pd

    df = pd.read_parquet(input_parquet)
    ids, embs = massage_embeddings(df, dim=dim)
    logger.info("compressing %d embeddings dim=%d", len(ids), dim)
    artifact = train_reconstruction(
        ids, embs, expansion_factor, k_shift, num_epochs=recon_epochs
    )
    artifact.update(
        train_mask_model(ids, expansion_factor, num_epochs=mask_epochs)
    )
    meta = {
        "num_embeddings": int(expansion_factor * len(ids)),
        "dim": dim,
        "num_shifts": k_shift,
        "normalize_output": True,
        "source": input_parquet,
    }
    save_artifact(artifact, output_dir, meta)
    logger.info("saved embedding module artifact to %s", output_dir)


if __name__ == "__main__":
    import argparse

    logging.basicConfig(level=logging.INFO, force=True)
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet with product_id + emb_128")
    ap.add_argument("--output", required=True)
    ap.add_argument("--dim", type=int, default=32)
    ap.add_argument("--expansion-factor", type=float, default=1.15)
    ap.add_argument("--k-shift", type=int, default=16)
    ap.add_argument("--recon-epochs", type=int, default=50)
    ap.add_argument("--mask-epochs", type=int, default=20)
    a = ap.parse_args()
    execute(a.input, a.output, a.dim, a.expansion_factor, a.k_shift, a.recon_epochs, a.mask_epochs)
