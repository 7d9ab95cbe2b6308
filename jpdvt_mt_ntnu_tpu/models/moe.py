"""Mixture-of-Experts MLP with expert-choice routing, for the DiT blocks.

A beyond-reference extension (the reference's DiT is dense-only,
image_model/models.py:84-98): ``model.moe_experts=E`` swaps every block's
MLP for E experts and adds the 'ep' mesh axis for expert parallelism.

TPU-first design choices:

- **Expert-choice routing** (Zhou et al. 2022, "Mixture-of-Experts with
  Expert Choice Routing"): each expert picks its own top-C tokens instead
  of tokens picking experts. Load is perfectly balanced BY CONSTRUCTION —
  every expert processes exactly C = capacity*N/E tokens — so there is no
  auxiliary load-balancing loss, no token dropping heuristics, and no
  data-dependent shapes. A DiT sees the whole sequence at once (no
  autoregressive causality to violate), which is exactly the setting
  expert choice is designed for.
- **Dense one-hot dispatch/combine einsums** (the GSPMD MoE idiom, as in
  MaxText/Mixtral-JAX): routing compiles to top_k + one_hot + three
  einsums — static shapes, MXU-friendly, and XLA inserts the expert
  all-to-alls from the sharding annotations alone when the expert dim is
  sharded over 'ep' (parallel/sharding.py). No hand-written collectives.
- Router logits/softmax in fp32 (routing is precision-sensitive; the
  expert FFNs themselves run in the model compute dtype).

Tokens no expert selects contribute zero here and survive through the
block's residual connection (standard expert-choice behavior). With
``num_experts=1, capacity_factor=1.0`` the layer reduces EXACTLY to the
dense ``Mlp`` (one expert choosing all N tokens with gate softmax == 1),
which tests/test_moe.py pins.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any

_xavier = nn.initializers.xavier_uniform()
_normal02 = nn.initializers.normal(stddev=0.02)
_zeros = nn.initializers.zeros_init()


class ExpertChoiceMoE(nn.Module):
    """Drop-in replacement for ``Mlp`` inside a DiT block.

    Input (B, N, d) -> output (B, N, out). Each of ``num_experts`` experts
    is an independent fc1/gelu/fc2 FFN; expert e processes the C tokens on
    which its router probability is highest, weighted by that probability.
    """

    hidden: int
    out: int
    num_experts: int
    capacity_factor: float = 2.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, n, d = x.shape
        e = self.num_experts
        c = max(1, min(n, int(self.capacity_factor * n / e)))

        # Router (fp32): per-token probabilities over experts.
        logits = nn.Dense(e, kernel_init=_normal02, dtype=jnp.float32,
                          param_dtype=jnp.float32, name="router")(
            x.astype(jnp.float32))
        probs = nn.softmax(logits, axis=-1)                    # (B, N, E)

        # Expert choice: expert e takes its top-C tokens.
        scores = probs.transpose(0, 2, 1)                      # (B, E, N)
        gate, idx = jax.lax.top_k(scores, c)                   # (B, E, C)
        disp = nn.activation.one_hot(idx, n, dtype=x.dtype)    # (B, E, C, N)

        # Stacked expert FFNs: leading E dim is the 'ep' sharding dim.
        wi = self.param("wi", _xavier, (e, d, self.hidden), self.param_dtype)
        bi = self.param("bi", _zeros, (e, self.hidden), self.param_dtype)
        wo = self.param("wo", _xavier, (e, self.hidden, self.out),
                        self.param_dtype)
        bo = self.param("bo", _zeros, (e, self.out), self.param_dtype)

        xd = x.astype(self.dtype)
        xe = jnp.einsum("becn,bnd->becd", disp, xd)            # dispatch
        h = jnp.einsum("becd,edh->bech", xe, wi.astype(self.dtype))
        h = nn.gelu(h + bi.astype(self.dtype)[None, :, None, :],
                    approximate=True)
        y = jnp.einsum("bech,eho->beco", h, wo.astype(self.dtype))
        y = y + bo.astype(self.dtype)[None, :, None, :]
        # Combine: scatter each expert's outputs back, gate-weighted.
        return jnp.einsum("becn,beco,bec->bno", disp, y,
                          gate.astype(self.dtype))
