"""Training-strategy configs + registry.

Rebuild of reference ``commons/configs/training_strategy_config.py``.  The
reference's 'accelerate' (Ray + DDP) strategy maps to the TPU-native 'pjit'
strategy: one process per host, a device mesh, a jit-compiled train step with
in-step collectives.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

from pydantic import BaseModel, ConfigDict

training_strategy_registry: Dict[str, type] = {}


class TrainingStrategyConfig(BaseModel):
    model_config = ConfigDict(extra="allow", protected_namespaces=())

    name: str

    @classmethod
    def __pydantic_init_subclass__(cls, **kwargs: Any) -> None:
        super().__pydantic_init_subclass__(**kwargs)
        name = cls.model_fields["name"].default
        if name is None:
            raise ValueError(f"'name' default required on {cls}")
        training_strategy_registry[name] = cls


class PjitTrainingStrategyConfig(TrainingStrategyConfig):
    """Mesh-parallel jit training (replaces reference 'accelerate')."""

    name: str = "pjit"
    # 'no' keeps f32 activations; 'bf16' is the TPU-native mixed precision
    # (reference AMP knob, accelerate_training_strategy.py:157).
    precision: str = "bf16"
    # mesh shape; data=-1 → all remaining devices
    mesh_data: int = -1
    mesh_model: int = 1
    mesh_expert: int = 1
    # DCN data-parallel granules (multi-slice): None auto-detects one granule
    # per TPU slice / host; 1 forces a flat single-slice ICI mesh
    mesh_dcn_data: int | None = None
    # donate the train-state buffers to the step (in-place updates on device)
    donate_state: bool = True
    timeout: int = 300
    # jax.profiler trace capture window (None disables)
    profile_dir: str | None = None
    profile_start_step: int = 10
    profile_num_steps: int = 5
    # sanitizer mode: checkify every step for NaN/Inf/OOB (slow; debug only)
    debug_numerics: bool = False


class SingleDeviceTrainingStrategyConfig(TrainingStrategyConfig):
    """Degenerate 1-chip mesh (replaces reference 'one_gpu' stub)."""

    name: str = "single_device"
    precision: str = "bf16"
