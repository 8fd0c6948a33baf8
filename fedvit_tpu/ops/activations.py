"""Activation functions tuned for TPU bfloat16 compute.

gelu: exact-erf GELU is the reference semantics (torch nn.GELU, reference
model.py:141), but XLA's f32 erf lowers to a branchy polynomial with an exp
tail, and its VJP adds another exp — fused into the MLP's second matmul this
cost ~33 ms/step on SwinV2-L@384 bs=16 (Dense_1 ran at 14-40% MXU while the
activation-free Dense_0 ran at 88-94%; trace, round 3). For bfloat16
activations that precision is unobservable, so the bf16 path uses the
CHEAPEST sub-bf16-ulp approximation. Measured on v5e MLP fwd+bwd
(tools/mlp_micro.py, ViT-L shapes 16×577×1024×4096, MXU efficiency):

    no activation  79%   |  tanh-GELU   78%   |  degree-7 poly  65%
    exact erf      55%   |

tanh-GELU (0.5·x·(1+tanh(√(2/π)(x+0.044715x³)))) is effectively free: XLA
lowers tanh to a tight hardware-scheduled rational kernel, and its VJP
reuses the saved tanh output (1−t²) instead of re-deriving a long
polynomial chain — the round-3 degree-7 Φ polynomial (kept below as
`_gelu_poly` for reference/tests) costs 13 points of MXU efficiency more.

Accuracy vs exact erf (measured over all bf16 grid points in [−10, 10]):
tanh-GELU max abs error 4.95e-4 (at x≈2.73) — under one bf16 ulp at unit
activation scale (7.8e-3), same bound as the poly (3.6e-4); for large
negative x the tanh form tracks the tail while the poly hard-zeros below
−4. The f32 path keeps exact erf so fp32 parity harnesses are untouched.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Φ(x) = 0.5·(1+erf(x/√2)) = 0.5 + x·Q(x²): degree-7 Chebyshev-fit power
# coefficients of the odd part's even factor Q on x ∈ [−4, 4]. Max abs
# error of x·Φ(x) vs exact-erf GELU: 6.5e-4 (at the ±4 seams), max rel
# error 1.6e-4 for |gelu| > 0.5; outside ±4 the exact tails (x / 0) are
# within 1.3e-4 relative / 6.6e-4 absolute. Superseded as the bf16 default
# by tanh-GELU (see module docstring) but kept as the transcendental-free
# fallback and accuracy reference.
_Q_COEFFS = (
    3.9893057151e-01, -6.6385202031e-02, 9.8168140480e-03,
    -1.0963635043e-03, 8.8456636691e-05, -4.7722158099e-06,
    1.5105542551e-07, -2.0920045701e-09,
)
_B = 4.0


def _gelu_poly(x: jnp.ndarray) -> jnp.ndarray:
    y = jnp.clip(x.astype(jnp.float32), -_B, _B)
    t = y * y
    q = jnp.float32(_Q_COEFFS[-1])
    for c in _Q_COEFFS[-2::-1]:
        q = q * t + jnp.float32(c)
    p = y * (0.5 + y * q)
    x32 = x.astype(jnp.float32)
    # >= / <= so inputs landing EXACTLY on ±B (a full bf16 bucket wide)
    # take the linear/zero branches — inside the clip they would tie
    # jnp.minimum/maximum, whose gradient splits 0.5/0.5
    return jnp.where(x32 >= _B, x32,
                     jnp.where(x32 <= -_B, jnp.float32(0.0), p))


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact-semantics GELU: erf in f32, bf16-exact tanh form in bf16.

    The tanh path measured at activation-free MLP speed on v5e (see
    module docstring) — its VJP reuses the saved tanh value, keeping the
    MLP matmul fusions compute-bound on the MXU."""
    if x.dtype == jnp.bfloat16:
        return jax.nn.gelu(x.astype(jnp.float32),
                           approximate=True).astype(jnp.bfloat16)
    return jax.nn.gelu(x, approximate=False)
