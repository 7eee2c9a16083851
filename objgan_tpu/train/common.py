"""Shared trainer plumbing."""

from __future__ import annotations

import jax


def make_multi_step(train_step):
    """Wrap a ``(state, batch, rng) -> (state, metrics)`` step into a
    K-steps-per-device-execution scan (host/relay dispatch amortization;
    see TRAIN.STEPS_PER_EXECUTION).

    ``batches``: the regular batch pytree with a leading K axis. Returns the
    state after K steps and the metrics MEANED over the K axis (so no loss
    datapoint is discarded when logging granularity is K steps).
    """

    def multi_step(state, batches, rng):
        def body(carry, xb):
            state, key = carry
            key, sub = jax.random.split(key)
            state, metrics = train_step(state, xb, sub)
            return (state, key), metrics

        (state, _), metrics = jax.lax.scan(body, (state, rng), batches)
        return state, jax.tree.map(lambda m: m.mean(axis=0), metrics)

    return multi_step
