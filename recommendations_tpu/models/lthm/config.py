"""LTHM model config.

Rebuild of reference ``models/lthm/config.py`` with every runtime-accessed
field *declared* (the reference accesses ~10 undeclared fields that pydantic
silently drops — SURVEY.md §2.5#2: ``sparse``, ``loss_type``,
``log_q_config`` on the model config; ``inp_emb_dim``/``out_emb_dim``/
``norm_threshold``/``norm_bins``/``cosine_lsh_config``/
``model_init_metadata``/``latent_model_config`` on the product tower;
``dropout``/``num_layers`` on the transformer config).
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple, Literal

from pydantic import BaseModel, ConfigDict, model_validator

from recommendations_tpu.config.model_config import ModelConfig, ModelKind
from recommendations_tpu.config.trainer_config import FileSystemConfig


# Measured table-optimizer dispatch thresholds (QUALITY.md round 4, v5e,
# tools_bench_table.py primitives + strategy-shaped end-to-end steps):
#   - dense rowwise_adam wins at V=1M   (1075 vs 986 ex/s/chip trainable)
#   - sparse_fused_adam wins at V=10M   (881 vs 722 ex/s/chip trainable)
# The crossover sits between; pinned at 2M rows (the dense path's full-table
# moment traffic grows linearly in V while the sparse path's sort+scan+row
# scatter is ~flat in V for a fixed batch).
TABLE_OPT_SPARSE_FUSED_MIN_ROWS = 2_000_000
# lazy_rowwise_adam's touched-row scan is a nonzero over V — measured 140 ms
# at 1M and 969 ms (per step, update alone) at 10M: catastrophic. Hard-gated.
TABLE_OPT_LAZY_MAX_ROWS = 5_000_000


class CosineLSHSpec(BaseModel):
    num_bins: int
    num_proj: int


class LatentModelConfig(BaseModel):
    """Fresh (untrained) KShift product-embedding table when no pretrained
    module is provided — reference ``models/lthm/sequence/encoder.py:31-37``."""

    vocab_size_latent: int = 2**20
    num_shifts_latent: int = 8
    normalize_embedding: bool = False


class ModelInitMetadata(BaseModel):
    """Pointer to a pretrained product-embedding module artifact (the output
    of tools/embedding_module_gen) — reference ``encoder.py:22-29``."""

    embedding_module_path: str
    filesystem_config: Optional[FileSystemConfig] = None


class ProductTowerConfig(BaseModel):
    inp_emb_dim: int = 32
    out_emb_dim: int = 512
    # contrastive/retrieval space dim (the reference YAML calls it
    # item_emb_dim; code reads product_emb_dim — both accepted)
    product_emb_dim: int = 128
    item_emb_dim: Optional[int] = None
    detach_item_tower: bool = True
    norm_threshold: float = 0.05
    norm_bins: int = 20
    cosine_lsh_config: List[CosineLSHSpec] = []
    model_init_metadata: Optional[ModelInitMetadata] = None
    latent_model_config: LatentModelConfig = LatentModelConfig()

    def __init__(self, **kwargs):
        if kwargs.get("item_emb_dim") is not None and "product_emb_dim" not in kwargs:
            kwargs["product_emb_dim"] = kwargs["item_emb_dim"]
        # the reference YAML pins model_init_metadata to "???" (hydra
        # missing-value sentinel); treat it as absent
        if kwargs.get("model_init_metadata") in ("???", {}, ""):
            kwargs["model_init_metadata"] = None
        super().__init__(**kwargs)


class LogQConfig(BaseModel):
    """Streaming logQ sampled-softmax correction knobs —
    reference ``hydra-configs/model/lthm.yaml:6-10``."""

    num_buckets: int = 2**24
    hash_offsets: List[int] = [0]
    alpha: float = 0.05
    p_init: float = 0.01
    beta: float = 0.0


class PositionBiasConfig(BaseModel):
    context_window: int


class SelfAttentionConfig(BaseModel):
    """Reference ``commons/transformers/configs.py:27-34``."""

    attn_dropout: float = 0.1
    bias: bool = True
    dropout: float = 0.1
    n_head: int = 12
    n_embd: int = 768
    pos_bias: Optional[PositionBiasConfig] = None
    attn_type: str = "multi_head"  # 'multi_head' | 'multi_query'


class MoEConfig(BaseModel):
    num_experts: int
    proj_features: int
    ff_mult_factor: float
    gate_sizes: Optional[Tuple[int, ...]] = None
    top_k: Optional[int] = None


class MLPConfig(BaseModel):
    ff_mult: float


class TransformerConfig(BaseModel):
    """Reference ``commons/transformers/configs.py:37-44`` + the undeclared
    fields the query tower reads (``query_tower.py:39-43``)."""

    rotator_config: Any  # MoEConfig | MLPConfig | {'ff_mult': f} | float
    is_causal: bool = False
    max_block_size: Optional[int] = None
    is_sparse_attn: bool = False
    sparsity_factor: float = 0.5
    enable_gradient_checkpointing: bool = False
    # remat policy when checkpointing: 'dots_no_batch' (default — saves
    # projection GEMMs, recomputes the (B,H,S,S) attention logits), 'dots'
    # (saves every dot incl. attention logits), 'full' (recompute everything)
    remat_policy: Literal["dots", "dots_no_batch", "full"] = "dots_no_batch"
    # Pallas blockwise attention; with pos_bias set the fused kernel applies
    # the relative-position bias in-kernel (ops/fused_attention_bias)
    use_flash_attention: bool = False
    # context parallelism: shard the sequence dim over the mesh 'model' axis,
    # attention runs the ring schedule (parallel/ring_attention) — the
    # scale-out path for seq ≥ 1024 the reference lacks (SURVEY §5).
    # Requires is_causal and pos_bias=None; no-op when the axis has 1 device.
    sequence_parallel: bool = False
    attn_config: SelfAttentionConfig
    dropout: float = 0.0
    num_layers: int = 2

    def rotator(self):
        """Normalize rotator_config to float (MLP mult) or MoESpec."""
        from recommendations_tpu.nn.transformer import MoESpec

        rc = self.rotator_config
        if isinstance(rc, (int, float)):
            return float(rc)
        if isinstance(rc, MLPConfig):
            return float(rc.ff_mult)
        if isinstance(rc, MoEConfig):
            return MoESpec(
                num_experts=rc.num_experts,
                proj_features=rc.proj_features,
                ff_mult_factor=rc.ff_mult_factor,
                gate_sizes=tuple(rc.gate_sizes or ()),
                top_k=rc.top_k,
            )
        if isinstance(rc, dict):
            if "ff_mult" in rc:
                return float(rc["ff_mult"])
            moe = rc.get("moe", rc)
            if "num_experts" in moe:
                return MoESpec(
                    num_experts=moe["num_experts"],
                    proj_features=moe["proj_features"],
                    ff_mult_factor=moe["ff_mult_factor"],
                    gate_sizes=tuple(moe.get("gate_sizes") or ()),
                    top_k=moe.get("top_k"),
                )
        return 4.0


class LTHMModelConfig(ModelConfig):
    model_config = ConfigDict(arbitrary_types_allowed=True, protected_namespaces=())

    kind: ModelKind = ModelKind.LTHM
    type: str = "lthm_seq"
    name: str = "lthm"
    sparse: bool = False
    loss_type: str = "contrastive"
    log_q_config: LogQConfig = LogQConfig()
    n_labels: int = 5
    lookahead: List[int] = [0, 5, 6, 12, 24, 30]
    detach_input_for_loss_calc: bool = False
    softmax_temperature: float = 0.05
    transformer_config: TransformerConfig
    metrics_k_all: List[int] = [1, 5, 20, 50]
    context_width: int = 150
    lr: float = 6e-4
    weight_decay: float = 0.0
    betas: Tuple[float, float] = (0.9, 0.95)
    train_mini_batch_size: int = -1
    min_history_size: int = 1
    product_tower: ProductTowerConfig = ProductTowerConfig()
    use_only_updated_data: bool = False
    knn_eval: bool = False
    # activation/matmul dtype ('bfloat16' | 'float32'); params stay float32
    # and the loss computes in float32 (replaces the reference's AMP knob,
    # disabled there for instability — lthm_train.yaml:107-108)
    compute_dtype: str = "bfloat16"
    # parallelism: shard the product-embedding table rows over the 'model'
    # mesh axis (the flagship TPU capability; no reference equivalent)
    shard_embedding_rows: bool = False
    # collective schedule for the sharded lookup: 'alltoall' (unique-ID
    # exchange — comm proportional to distinct rows touched; the pod-scale
    # schedule) or 'psum' (owned-row all-reduce of the dense activation)
    embedding_lookup_schedule: str = "alltoall"
    # optimizer for the product-embedding table group: 'rowwise_adam'
    # (second moment per row — halves optimizer-state memory on the one
    # parameter that dominates it) or 'adamw' (reference puts everything in
    # one AdamW group, wrapper.py:260-275)
    # 'rowwise_adam': dense rowwise Adam over the full table each step;
    # 'lazy_rowwise_adam': dense grad, but only batch-touched rows get
    # moment updates (reference sparse-optimizer semantics; its touched-row
    # scan is a nonzero over V — measured 969 ms at V=10M, only viable for
    # small tables); 'sparse_fused_adam': fully sparse — the table+moments
    # live in one (V, 128) record, the gradient stays compact (tap
    # cotangent), and the step is one row gather + one row scatter
    # (train/sparse_table.py — the large-V path); 'adamw': table joins the
    # generic dense AdamW group; 'frozen': no table updates at all — the
    # HONEST parity setting: the reference detaches the product tower input
    # (product_tower.py:47), so with detach_item_tower=True the table's
    # gradient is structurally zero and torch skips grad-less params in its
    # optimizer — paying dense moment passes for it here was pure waste.
    # 'auto' (the default) encodes the measured dispatch rule — see
    # resolved_table_optimizer().
    table_optimizer: Literal[
        "auto", "rowwise_adam", "lazy_rowwise_adam", "sparse_fused_adam",
        "adamw", "frozen"
    ] = "auto"
    # contrastive-CE implementation: the XLA formulation (module-level
    # custom VJP + bf16 logits storage, loss.py:_ce_core) measures a wash
    # against the Pallas fused kernel at the prod chunk shape (5.21 vs
    # 5.31 ms, N=16K D=128) and stays the default; 'fused' routes through
    # ops/fused_ce (never materializes the (N, N) tile in HBM — for larger
    # N / narrower D regimes). A typed field so the choice is serialized
    # with the run config (was the RECS_FUSED_CE env var, VERDICT r3 #7).
    fused_ce: bool = False

    @property
    def emb_dim(self) -> int:
        return self.transformer_config.attn_config.n_embd

    @model_validator(mode="after")
    def _gate_lazy_at_scale(self):
        """lazy_rowwise_adam is catastrophic at large V (its touched-row scan
        is a nonzero over the full table: 969 ms/step at 10M, measured,
        train/sparse_table.py:42-43) — hard-error instead of silently
        training 10x slower. VERDICT r4 weak #2."""
        if (
            self.table_optimizer == "lazy_rowwise_adam"
            and self.product_tower.latent_model_config.vocab_size_latent
            >= TABLE_OPT_LAZY_MAX_ROWS
        ):
            raise ValueError(
                "table_optimizer=lazy_rowwise_adam at "
                f"{self.product_tower.latent_model_config.vocab_size_latent} "
                f"rows (>= {TABLE_OPT_LAZY_MAX_ROWS}): its nonzero-over-V "
                "touched-row scan measures 969 ms/step at 10M rows on v5e. "
                "Use table_optimizer: auto (resolves to sparse_fused_adam at "
                "this size) or sparse_fused_adam explicitly."
            )
        return self

    def resolved_table_optimizer(self) -> str:
        """Resolve 'auto' to the measured-best concrete choice.

        Dispatch table (QUALITY.md r4 measurements; unit-pinned in
        tests/test_sparse_table.py::test_auto_dispatch_table):
          - detach_item_tower=True  -> 'frozen'  (table gradient is
            structurally zero under the reference's detach semantics,
            product_tower.py:47 — any optimizer state would be pure waste)
          - pretrained module       -> 'frozen'  (table lives in frozen
            constants; there is no table param to optimize)
          - shard_embedding_rows    -> 'rowwise_adam' (dense moments
            co-sharded with the rows; the fused record is single-device)
          - V <  2M                 -> 'rowwise_adam' (dense wins: 1075 vs
            986 ex/s at 1M)
          - V >= 2M                 -> 'sparse_fused_adam' (881 vs 722 ex/s
            at 10M)

        Resolution happens at call time, not validation time, so tests and
        tools that flip ``detach_item_tower`` after construction see the
        choice they asked for.
        """
        t = self.table_optimizer
        if t != "auto":
            return t
        pt = self.product_tower
        if pt.detach_item_tower or pt.model_init_metadata is not None:
            return "frozen"
        if self.shard_embedding_rows:
            return "rowwise_adam"
        v = pt.latent_model_config.vocab_size_latent
        if v >= TABLE_OPT_SPARSE_FUSED_MIN_ROWS:
            return "sparse_fused_adam"
        return "rowwise_adam"

    def uses_fused_table(self) -> bool:
        """Fused-record sparse table path (train/sparse_table.py): gated to
        the unsharded fresh-table case; row-sharded tables keep the dense
        co-sharded optimizer, pretrained modules have no table param."""
        return (
            self.resolved_table_optimizer() == "sparse_fused_adam"
            and self.product_tower.model_init_metadata is None
            and not self.shard_embedding_rows
        )

    @property
    def export_tokens(self) -> int:
        return len(self.lookahead)

    @property
    def export_span(self) -> int:
        return max(self.lookahead) + 1

    def get_builder(self, stats: Optional[Any] = None):
        from recommendations_tpu.models.lthm.builder import LTHMModelBuilder

        return LTHMModelBuilder(stats, self)

    def custom_data_preprocessor(self, df, kind: str = "train"):
        """Drop users with fewer than min_history_size real events (the
        reference declares the knob but never applies it)."""
        if self.min_history_size <= 0:
            return df
        hist = self.features.categorical_history_features
        if not hist:
            return df
        name = hist[0].name
        if name not in df.columns:
            return df
        import numpy as np

        counts = df[name].map(lambda h: int(np.count_nonzero(np.asarray(h))))
        return df[counts >= self.min_history_size]
