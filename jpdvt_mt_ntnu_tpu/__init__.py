"""jpdvt_mt_ntnu_tpu — a TPU-native framework for diffusion-based jigsaw puzzle solving.

Ground-up JAX/XLA/Pallas/pjit rebuild of the capabilities of the reference
repo hamzafer/JPDVT-MT-NTNU (CVPR'24 JPDVT + NTNU master's-thesis extensions):

- ``core``      pure-function DDPM math: beta schedules, respacing, q/p
                processes, training losses, and whole-chain samplers compiled
                as a single ``jax.lax.scan`` under ``jit``.
- ``models``    Flax DiT backbone (adaLN-Zero, dual image+positional-code
                heads) with the full config registry of the reference
                (reference: image_model/models.py:373-424).
- ``ops``       TPU kernels and device-side tensor ops: Pallas fused
                attention, jigsaw patchify/permute/reassemble, batched
                assignment solvers.
- ``parallel``  device-mesh construction, sharding rules and collective
                helpers (the XLA-native replacement for the reference's
                NCCL/DDP layer, reference: image_model/train_JPDVT.py:111,231).
- ``data``      host-side input pipeline (decode/crop/augment) and the
                MET/TEXMET puzzle dataset family
                (reference: image_model/datasets.py).
- ``train``     train step, optimizer/EMA, Orbax checkpointing, validation
                (reference: image_model/train_JPDVT.py).
- ``eval``      batched solver harness with resumable CSV journaling
                (reference: image_model/inference*.py).
- ``serve``     HTTP puzzle service with the reference API contract
                (reference: api/app.py).
- ``tools``     checkpoint converters, golden-tensor recorder, report tools.
"""

__version__ = "0.1.0"
