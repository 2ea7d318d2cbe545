"""Device mesh construction for multi-chip TFHE (SURVEY.md section 2.2).

Axes:
  * ``batch`` — independent ciphertexts (DP analog): gates/PBS are
    embarrassingly parallel per ciphertext (src/boolean.rs has zero cross-ct
    coupling), so this axis scales near-linearly with zero steady-state
    collective traffic.
  * ``model`` — the (k+1)*levels decomposed rows / GGSW rows of the external
    product (TP analog): partial int32 accumulators are psum-reduced per CMUX
    step.  Must divide (k+1)*levels (and kN*l_ks for the key switch).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXIS = "batch"
MODEL_AXIS = "model"
STAGE_AXIS = "stage"


def make_mesh(batch: int | None = None, model: int = 1, devices=None) -> Mesh:
    """Build a (batch, model) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if batch is None:
        batch = len(devices) // model
    assert batch * model == len(devices), (batch, model, len(devices))
    arr = np.array(devices).reshape(batch, model)
    return Mesh(arr, (BATCH_AXIS, MODEL_AXIS))


def make_pipeline_mesh(batch: int | None = None, stage: int = 1, devices=None) -> Mesh:
    """Build a (batch, stage) mesh for pipeline-parallel blind rotation
    (parallel/pipeline.py): DP over ciphertexts x PP over rotation steps."""
    devices = list(devices if devices is not None else jax.devices())
    if batch is None:
        batch = len(devices) // stage
    assert batch * stage == len(devices), (batch, stage, len(devices))
    arr = np.array(devices).reshape(batch, stage)
    return Mesh(arr, (BATCH_AXIS, STAGE_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for ciphertext batches: leading axis over ``batch``."""
    return NamedSharding(mesh, P(BATCH_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
