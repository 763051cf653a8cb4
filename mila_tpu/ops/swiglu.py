"""SwiGLU gated activation with manual VJP.

Not in the reference snapshot (dev-branch capability, README.md:5-13);
required by BASELINE for the Llama-3.2 MLP: ``silu(gate) * up``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def silu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(x)


@jax.custom_vjp
def swiglu(gate: jax.Array, up: jax.Array) -> jax.Array:
    """silu(gate) ⊙ up — the Llama FFN nonlinearity."""
    return silu(gate) * up


def _swiglu_fwd(gate, up):
    return swiglu(gate, up), (gate, up)


def _swiglu_bwd(res, g):
    gate, up = res
    gf = gate.astype(jnp.float32)
    s = jax.nn.sigmoid(gf)
    sil = gf * s
    dsilu = s + gf * s * (1.0 - s)  # d/dx [x·σ(x)]
    g32 = g.astype(jnp.float32)
    dgate = (g32 * up.astype(jnp.float32) * dsilu).astype(gate.dtype)
    dup = (g32 * sil).astype(up.dtype)
    return dgate, dup


swiglu.defvjp(_swiglu_fwd, _swiglu_bwd)
