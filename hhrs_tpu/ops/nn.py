"""Primitive NN ops as pure functions over explicit param pytrees.

Initialization distributions intentionally match the reference's framework
defaults so that training dynamics are comparable:
  * linear: kernel & bias ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in));
  * embedding: N(0, 1);
  * batchnorm: scale=1, bias=0, running mean=0 / var=1, with momentum-0.1
    running-stat updates and the biased/unbiased variance split the
    reference's BatchNorm1d uses (normalize with biased batch var, update
    running var with the unbiased one).

``batchnorm_apply`` takes an optional ``axis_name``: under data-parallel
pjit/shard_map the batch statistics are psum-averaged across the data axis
(sync-BN), which keeps train-time semantics identical to single-device
execution at any DP degree.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def linear_init(rng, fan_in: int, fan_out: int, dtype=jnp.float32) -> dict:
    kr, br = jax.random.split(rng)
    bound = 1.0 / jnp.sqrt(fan_in)
    return {
        "kernel": jax.random.uniform(kr, (fan_in, fan_out), dtype, -bound, bound),
        "bias": jax.random.uniform(br, (fan_out,), dtype, -bound, bound),
    }


def linear_apply(p: dict, x: jnp.ndarray, compute_dtype=None, out_dtype=None) -> jnp.ndarray:
    """y = x·k + b. ``compute_dtype`` casts the matmul INPUTS (bf16 feeds the
    MXU at full rate); accumulation is always f32 (preferred_element_type).
    ``out_dtype`` casts the OUTPUT — the storage dtype of the activation that
    XLA materializes to HBM between fusions. On an HBM-bound step (the DCN-R
    roofline, RESULTS.md) out_dtype=bf16 halves that traffic; the cast fuses
    into the matmul epilogue so it costs no extra pass."""
    k, b = p["kernel"], p["bias"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        k = k.astype(compute_dtype)
    y = jnp.dot(x, k, preferred_element_type=jnp.float32)
    y = y + b.astype(y.dtype)
    return y if out_dtype is None else y.astype(out_dtype)


def embedding_init(rng, n_rows: int, dim: int, dtype=jnp.float32) -> jnp.ndarray:
    return jax.random.normal(rng, (n_rows, dim), dtype)


def batchnorm_init(dim: int, dtype=jnp.float32) -> tuple[dict, dict]:
    params = {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}
    state = {"mean": jnp.zeros((dim,), dtype), "var": jnp.ones((dim,), dtype)}
    return params, state


def batchnorm_apply(
    params: dict,
    state: dict,
    x: jnp.ndarray,
    *,
    train: bool,
    momentum: float = 0.1,
    eps: float = 1e-5,
    axis_name: str | None = None,
) -> tuple[jnp.ndarray, dict]:
    # Statistics and normalization always run in f32 — a bf16 mean over a
    # 32k batch loses ~3 decimal digits. For f32 inputs the casts are
    # no-ops (byte-identical program); for bf16 STORAGE inputs
    # (model.storage_dtype) only the output is cast back down, and the
    # running state stays f32.
    xf = x.astype(jnp.float32)
    if train:
        n_local = x.shape[0]
        if n_local <= 1 and axis_name is None:
            # torch BatchNorm1d raises 'Expected more than 1 value per
            # channel' here; clamping the Bessel factor instead would
            # silently decay running var toward 0. Batch size is static
            # under jit, so parity can fail loudly at trace time.
            raise ValueError(
                "BatchNorm training needs >1 example per batch "
                "(torch BatchNorm1d parity)"
            )
        mean = jnp.mean(xf, axis=0)
        n_total = n_local
        if axis_name is not None:
            mean = jax.lax.pmean(mean, axis_name)
            n_total = n_local * jax.lax.psum(1, axis_name)
        # CENTERED variance (torch's form), not E[x²]−E[x]²: the one-pass
        # form cancels catastrophically for |mean| large / var tiny and
        # can go NEGATIVE past eps, sending rsqrt to NaN (measured:
        # mean≈300, true var 8e-8 → var_biased −0.0078 → NaN step — r4
        # review finding). The centered form is a sum of squares, ≥0 by
        # construction; under sync-BN the GLOBAL mean feeds the local
        # deviations, so the two pmeans serialize (same collective count).
        var_biased = jnp.mean(jnp.square(xf - mean), axis=0)
        if axis_name is not None:
            var_biased = jax.lax.pmean(var_biased, axis_name)
        bessel = n_total / jnp.maximum(n_total - 1, 1)
        var_unbiased = var_biased * bessel
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * var_unbiased,
        }
        inv = jax.lax.rsqrt(var_biased + eps)
        y = (xf - mean) * inv * params["scale"] + params["bias"]
        return y.astype(x.dtype), new_state
    inv = jax.lax.rsqrt(state["var"] + eps)
    y = (xf - state["mean"]) * inv * params["scale"] + params["bias"]
    return y.astype(x.dtype), state


def rate_may_be_positive(rate) -> bool:
    """Python-level gate for dropout branches: True when ``rate`` could be
    positive at runtime. A traced rate (the vectorized-HPO path vmaps the
    dropout probability across trials, hpo/vectorized.py) can't be compared
    under ``if`` — the branch stays in the program and rate 0.0 degrades to
    an exact identity inside ``dropout`` (keep=1 → all-true mask, x/1)."""
    return isinstance(rate, jnp.ndarray) or rate > 0.0


def dropout(x: jnp.ndarray, rate: float, rng) -> jnp.ndarray:
    if not rate_may_be_positive(rate):
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    # dtype-preserving: under bf16 activation storage (model.storage_dtype)
    # a weak-typed f32 `keep` must not promote the masked tensor back to f32
    return jnp.where(mask, x / jnp.asarray(keep, x.dtype), jnp.zeros((), x.dtype))
