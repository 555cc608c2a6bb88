"""Global numeric configuration.

The reference is fp64-everywhere (Eigen doubles). On TPU the MXU wants
fp32/bf16; we keep everything dtype-polymorphic: functions inherit the dtype of
their inputs. Tests run on CPU with jax_enable_x64 for fp64 parity against the
reference's semantics; TPU runs use fp32 accumulation (see SURVEY.md §7
"fp precision").
"""

import jax.numpy as jnp

def default_dtype():
    """Return fp64 when x64 is enabled (CPU test/certification mode), else fp32."""
    return jnp.zeros(()).dtype
