"""Compressor and Gate: threshold-triggered envelope automatons.

Parity targets: ``/root/reference/pyAudioDspTools/EffectCompressor.py:26-125``
and ``EffectGate.py:26-127`` — structurally the same sample-serial while-loop
state machine with states Resting/Attack/Hold/Release, linear attack/release
ramps, and counters carried across chunks.

The reference's nested-while control flow was re-derived (SURVEY.md §7 hard
part #1) into an equivalent per-sample transition function, which makes it a
``lax.scan`` with a tiny carry — chunk-size independent, vmappable over
channels, and shardable. The derivation, verified against the reference by
execution:

* The gain at each sample depends only on the over-threshold mask (computed
  once per chunk from the raw input) and the automaton state — the in-place
  multiplies never feed back into the mask.
* Modes: REST (gain 1) -> on trigger ATTACK (ramp ``attack_env[x]``, advancing
  unconditionally, ignoring the mask — the reference's attack while-loop never
  re-checks the threshold) -> HOLD at full ratio while over -> RELEASE (ramp
  ``release_env[y]`` on non-over samples).
* A re-trigger during RELEASE re-enters HOLD at full ratio for that same
  sample: the reference's counter-freeze + ``x = x_max - int(y*(x_max/y_max))``
  re-entry always sees ``y == 0`` (y is zeroed before the freeze-break,
  EffectCompressor.py:113), so the proportional formula is dead code and the
  re-entry gain is always ``attack_env[x_max-1]`` (the Hold multiply).
* When a release completes, the reference's outer loop double-increments its
  counter (release loop already advanced past the last ramped sample, then the
  bottom ``counter += 1`` runs), so exactly one sample after each completed
  release is never examined: gain 1 even if over threshold. Modeled as the
  ``skip`` carry bit. This also covers the chunk-boundary variant (y carried
  at y_max skips the next chunk's first sample).
* The per-call ``full_envelope`` local is unobservable: REST is only ever
  reached together with ``full_envelope = True``.

The Gate is the same machine with the signal pre-scaled by ``depth`` and ramps
running 1.0 <-> 1/depth (un-ducking); its mask still comes from the unscaled
input (EffectGate.py:56-57).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import EngineConfig
from .base import Effect, pytree_dataclass

REST, ATTACK, HOLD, RELEASE = 0, 1, 2, 3


@pytree_dataclass(meta_fields=("x_max", "y_max"))
class DynamicsParams:
    threshold: jnp.ndarray     # 10^(threshold_db/20), float32
    pre_gain: jnp.ndarray      # 1.0 (compressor) or depth (gate)
    attack_env: jnp.ndarray    # (x_max,) float32 ramp, 1.0 -> end_gain
    release_env: jnp.ndarray   # (y_max,) float32 ramp, end_gain -> 1.0
    x_max: int
    y_max: int


def compressor(cfg: EngineConfig, threshold_db: float = -15.0,
               ratio: float = 0.60, attack_ms: float = 3.1,
               release_ms: float = 30.1) -> Effect:
    """CreateCompressor parity. ``ratio`` is a gain multiplier in (0, 1), not a
    classic N:1 ratio (EffectCompressor.py:18-19)."""
    x_max = cfg.ms_to_samples(attack_ms)
    y_max = cfg.ms_to_samples(release_ms)
    params = DynamicsParams(
        threshold=jnp.float32(np.float32(10.0 ** (threshold_db / 20.0))),
        pre_gain=jnp.float32(1.0),
        attack_env=jnp.asarray(np.linspace(1.0, ratio, num=x_max, dtype=np.float32)),
        release_env=jnp.asarray(np.linspace(ratio, 1.0, num=y_max, dtype=np.float32)),
        x_max=x_max,
        y_max=y_max,
    )
    return Effect(name="compressor", params=params, init_state=init_state,
                  step=step, offline=offline, time_parallel=False)


def gate(cfg: EngineConfig, threshold_db: float = -5.0, depth: float = 0.1,
         attack_ms: float = 3.1, release_ms: float = 200.1) -> Effect:
    """CreateGate parity. The reference hard-codes 44100 Hz for its envelope
    lengths (EffectGate.py:29,32); we honor ``cfg.sample_rate`` (identical at
    44100 — divergence documented in SURVEY.md §7)."""
    x_max = cfg.ms_to_samples(attack_ms)
    y_max = cfg.ms_to_samples(release_ms)
    inv = 1.0 / depth
    params = DynamicsParams(
        threshold=jnp.float32(np.float32(10.0 ** (threshold_db / 20.0))),
        pre_gain=jnp.float32(depth),
        attack_env=jnp.asarray(np.linspace(1.0, inv, num=x_max, dtype=np.float32)),
        release_env=jnp.asarray(np.linspace(inv, 1.0, num=y_max, dtype=np.float32)),
        x_max=x_max,
        y_max=y_max,
    )
    return Effect(name="gate", params=params, init_state=init_state, step=step,
                  offline=offline, time_parallel=False)


def init_state(params: DynamicsParams, batch_shape: tuple[int, ...] = ()):
    return {
        "mode": jnp.full(batch_shape, REST, dtype=jnp.int32),
        "x": jnp.zeros(batch_shape, dtype=jnp.int32),
        "y": jnp.zeros(batch_shape, dtype=jnp.int32),
        "skip": jnp.zeros(batch_shape, dtype=jnp.bool_),
    }


def _automaton_step(params: DynamicsParams, carry, over):
    """One sample: (carry, over-mask) -> (carry, gain). Branchless, elementwise
    over any batch shape."""
    mode, x, y, skip = carry["mode"], carry["x"], carry["y"], carry["skip"]
    x_max, y_max = params.x_max, params.y_max
    ratio_gain = params.attack_env[x_max - 1]

    att_g = params.attack_env[jnp.minimum(x, x_max - 1)]
    rel_g = params.release_env[jnp.minimum(y, y_max - 1)]

    is_rest = mode == REST
    is_att = mode == ATTACK
    is_hold = mode == HOLD
    is_rel = mode == RELEASE

    gain = jnp.where(
        is_att, att_g,
        jnp.where(is_hold | is_rel, jnp.where(over, ratio_gain, rel_g), 1.0),
    )
    gain = jnp.where(skip, 1.0, gain)

    # --- transitions ---
    # REST: trigger starts the attack at env[0] (== 1.0), x advances to 1.
    trig = is_rest & over & ~skip
    n_mode = jnp.where(trig, jnp.where(x_max == 1, HOLD, ATTACK), mode)
    n_x = jnp.where(trig, 1, x)

    # ATTACK: advance unconditionally; finish -> HOLD.
    adv = is_att & ~skip
    n_x = jnp.where(adv, x + 1, n_x)
    n_mode = jnp.where(adv & (x + 1 >= x_max), HOLD, n_mode)

    # HOLD: stays while over; a non-over sample is the first release sample.
    to_rel = is_hold & ~over & ~skip
    # RELEASE non-over: ramp advances.
    rel_adv = (is_rel & ~over & ~skip) | to_rel
    n_y = jnp.where(rel_adv, y + 1, y)
    n_x = jnp.where(rel_adv, 0, n_x)
    n_mode = jnp.where(rel_adv, RELEASE, n_mode)
    # Release completes: back to REST and skip the next sample entirely
    # (the reference's double counter increment).
    done = rel_adv & (y + 1 >= y_max)
    n_mode = jnp.where(done, REST, n_mode)
    n_x = jnp.where(done, 0, n_x)
    n_y = jnp.where(done, 0, n_y)
    n_skip = done

    # RELEASE re-trigger: that sample already got ratio_gain; re-enter HOLD.
    re_trig = is_rel & over & ~skip
    n_mode = jnp.where(re_trig, HOLD, n_mode)
    n_x = jnp.where(re_trig, x_max, n_x)
    n_y = jnp.where(re_trig, 0, n_y)

    # skip consumes itself.
    n_skip = jnp.where(skip, False, n_skip)

    new_carry = {"mode": n_mode, "x": n_x, "y": n_y, "skip": n_skip}
    return new_carry, gain


def _gains(params: DynamicsParams, state, over: jnp.ndarray):
    """Scan the automaton over the last (time) axis of ``over``."""
    over_t = jnp.moveaxis(over, -1, 0)

    def body(carry, o):
        return _automaton_step(params, carry, o)

    state, gains_t = jax.lax.scan(body, state, over_t)
    return state, jnp.moveaxis(gains_t, 0, -1)


def step(params: DynamicsParams, state, block: jnp.ndarray):
    over = jnp.abs(block) > params.threshold
    state, gains = _gains(params, state, over)
    out = (block * params.pre_gain * gains).astype(jnp.float32)
    return state, out


def offline(params: DynamicsParams, blocks: jnp.ndarray) -> jnp.ndarray:
    """The automaton is chunk-size independent (see module docstring), so the
    offline path is one scan over the flattened signal."""
    shape = blocks.shape
    x = blocks.reshape(shape[:-2] + (shape[-2] * shape[-1],))
    state = init_state(params, x.shape[:-1])
    _, out = step(params, state, x)
    return out.reshape(shape)
