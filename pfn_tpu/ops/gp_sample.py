"""On-device batched GP sample-path generation and exact GP posteriors.

This replaces the reference's gpytorch-based sampling (reference
priors/fast_gp.py:49-56: build K(x,x)+sigma^2 I, Cholesky, multiply a standard
normal) with fused jnp: pairwise distances -> kernel matrix -> batched
``jax.lax.linalg.cholesky`` -> matmul, all vmapped over the batch of datasets
and jittable inside the train step. Cholesky runs in float32 (TPU MXU is
bf16-biased; GP covariance factorization needs f32 accumulation).

Also hosts the exact-GP posterior used as the correctness oracle (reference
priors/fast_gp.py:88-120), vectorized over context sizes with an
identity-masking trick instead of the reference's per-t Python loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _sq_dists(x1: jax.Array, x2: jax.Array) -> jax.Array:
    """Pairwise squared euclidean distances. x1: (..., N, F), x2: (..., M, F)."""
    # (x - y)^2 = x^2 + y^2 - 2xy, clamped for numerical safety. HIGHEST
    # matmul precision: the TPU MXU's default f32 path (bf16 passes) puts
    # ~1e-2-scale errors into K, which swamps likelihood noises of 1e-4 and
    # breaks the Cholesky at large T.
    n1 = jnp.sum(x1 * x1, axis=-1, keepdims=True)
    n2 = jnp.sum(x2 * x2, axis=-1, keepdims=True)
    cross = jnp.einsum(
        "...nf,...mf->...nm",
        x1,
        x2,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.maximum(n1 + jnp.swapaxes(n2, -1, -2) - 2.0 * cross, 0.0)


def rbf_kernel(
    x1: jax.Array,
    x2: jax.Array,
    lengthscale,
    outputscale,
) -> jax.Array:
    """ScaleKernel(RBFKernel) parity (gpytorch defaults used at reference
    priors/fast_gp.py:17): K = outputscale * exp(-||x-x'||^2 / (2 l^2)).

    ``lengthscale`` may be scalar or (F,) for ARD.
    """
    ls = jnp.asarray(lengthscale)
    x1 = x1 / ls
    x2 = x2 / ls
    return outputscale * jnp.exp(-0.5 * _sq_dists(x1, x2))


def matern52_kernel(
    x1: jax.Array,
    x2: jax.Array,
    lengthscale,
    outputscale,
) -> jax.Array:
    """Matern-5/2 (ARD) kernel, parity with the botorch SingleTaskGP default
    covariance used by the GP hyperprior-mixture prior (reference
    priors/fast_gp_mix.py:24-55)."""
    ls = jnp.asarray(lengthscale)
    d = jnp.sqrt(_sq_dists(x1 / ls, x2 / ls) + 1e-20)
    sqrt5_d = jnp.sqrt(5.0) * d
    return outputscale * (1.0 + sqrt5_d + (5.0 / 3.0) * d * d) * jnp.exp(-sqrt5_d)


def psd_safe_cholesky(A: jax.Array, initial_jitter: float = 1e-6, max_tries: int = 5):
    """Cholesky with escalating diagonal jitter (x10 per retry).

    RBF/Matern kernel matrices are numerically rank-deficient at large T in
    f32 (at T=2010, lengthscale 0.6, the plain factorization returns NaN),
    so a fixed jitter is not enough — this mirrors gpytorch's
    psd_safe_cholesky retry ladder, which is what keeps the reference's
    prior sampling alive at bptt=2010 (fast_gp.py:53-56 via gpytorch).
    Bounded ``lax.while_loop``; jittable.
    """
    T = A.shape[-1]
    eye = jnp.eye(T, dtype=A.dtype)

    def _ok(L):
        # Per-MATRIX finiteness over the trailing two axes: works both under
        # vmap (scalar) and for a directly-passed batched (..., T, T) input —
        # a whole-array reduce would re-jitter already-converged batch
        # members up to the worst element's jitter level.
        return jnp.all(jnp.isfinite(L), axis=(-2, -1))

    def cond(state):
        tries, L, _ = state
        return (tries < max_tries) & ~jnp.all(_ok(L))

    def body(state):
        tries, L, jit_now = state
        # Keep already-finite factorizations untouched.
        L_new = jax.lax.linalg.cholesky(A + jit_now * eye)
        L = jnp.where(_ok(L)[..., None, None], L, L_new)
        return tries + 1, L, jit_now * 10.0

    L0 = jax.lax.linalg.cholesky(A + initial_jitter * eye)
    first_retry = max(initial_jitter * 10.0, 1e-6)
    _, L, _ = jax.lax.while_loop(
        cond, body, (jnp.asarray(0), L0, jnp.asarray(first_retry, A.dtype))
    )
    # Exhausted ladder -> NaN factor. gpytorch raises here; inside jit we
    # cannot, and host callbacks (jax.debug.print) are unsupported on the
    # axon TPU backend — run under jax.config.update("jax_debug_nans", True)
    # (pfn_tpu.utils.profiling.debug_nans) to localize such failures.
    return L


def gp_sample_paths(
    key: jax.Array,
    x: jax.Array,
    lengthscale,
    outputscale,
    noise,
    kernel=rbf_kernel,
    jitter: float = 1e-6,
) -> jax.Array:
    """Sample y ~ N(0, K(x, x) + noise * I) per dataset in the batch.

    ``x``: (B, T, F); hyperparameters may be scalars (shared) or have a
    leading (B,) axis (per-dataset, used by the hyperprior-mixture prior).
    Returns y: (B, T), float32. Parity: the one-shot prior+likelihood sample
    at reference priors/fast_gp.py:53-56.
    """
    B, T, _ = x.shape

    def per_dataset(k, xb, ls, os_, nz):
        # HIGHEST matmul precision end to end: GP covariance work at noise
        # scales of 1e-4 cannot tolerate the TPU's default f32 matmul path.
        with jax.default_matmul_precision("highest"):
            K = kernel(xb.astype(jnp.float32), xb.astype(jnp.float32), ls, os_)
            A = K + nz * jnp.eye(T, dtype=jnp.float32)
            L = psd_safe_cholesky(A, initial_jitter=jitter)
            z = jax.random.normal(k, (T,), dtype=jnp.float32)
            return L @ z

    keys = jax.random.split(key, B)
    F = x.shape[-1]

    # Broadcast hyperparameters to a leading batch axis uniformly.
    # Accepted shapes: scalar (shared), (B,) per-dataset scalar, (F,) shared
    # ARD, (1, F) shared ARD, (B, F) per-dataset ARD. A 1-D input is
    # ambiguous when B == F — require an explicit 2-D shape there.
    def bcast(h):
        h = jnp.asarray(h, jnp.float32)
        if h.ndim == 1 and h.shape[0] == B == F:
            raise ValueError(
                f"ambiguous 1-D hyperparameter of length {h.shape[0]} with "
                f"batch_size == num_features == {B}: pass (1, {F}) for a "
                f"shared ARD vector or ({B}, 1) for per-dataset scalars"
            )
        if h.ndim == 1 and h.shape[0] == F and F != B:
            return jnp.broadcast_to(h, (B, F))  # shared ARD
        if h.ndim == 2 and h.shape[0] == 1:
            return jnp.broadcast_to(h, (B, h.shape[1]))
        if h.ndim > 0 and h.shape[0] == B:
            return h  # per-dataset
        return jnp.broadcast_to(h, (B,) + h.shape)

    return jax.vmap(per_dataset)(
        keys, x, bcast(lengthscale), bcast(outputscale), bcast(noise)
    )


@functools.lru_cache(maxsize=4)
def _grid_factor(G: int, lengthscale: float, outputscale: float):
    """One-time float64 Cholesky of the RBF kernel on a fixed [0, 1] grid.

    Computed in numpy f64 on the host (escalating jitter ladder like
    psd_safe_cholesky) then cast to f32: at G ~ 2048 the RBF Gram matrix is
    far too ill-conditioned for a f32 factorization (it would need ~1e-3
    jitter, inflating the effective noise), while the f64 factor cast to f32
    carries only rounding-level error. Cached per (G, hyperparameters) —
    the factor is a CONSTANT of the training run, which is the whole point
    of the grid fast path.
    """
    import numpy as np

    g = np.linspace(0.0, 1.0, G)
    d2 = (g[:, None] - g[None, :]) ** 2
    K = outputscale * np.exp(-0.5 * d2 / lengthscale**2)
    jitter = 1e-12 * max(outputscale, 1.0)
    for _ in range(10):
        try:
            L = np.linalg.cholesky(K + jitter * np.eye(G))
            break
        except np.linalg.LinAlgError:
            jitter *= 10.0
    else:
        raise np.linalg.LinAlgError(
            f"grid kernel not factorizable even at jitter {jitter:g}"
        )
    # Return DEVICE-resident arrays: a closed-over jax.Array is passed to
    # the compiled program by reference (constvar), while a closed-over
    # numpy array would be embedded as a 16 MB literal that this backend
    # re-uploads per execution (~300 ms/call measured — the whole win gone).
    # ensure_compile_time_eval forces the transfer to happen EAGERLY even
    # when this runs inside a jit trace — otherwise device_put would stage
    # into the jaxpr and the lru_cache would memoize (and leak) a tracer.
    with jax.ensure_compile_time_eval():
        return (
            jax.device_put(jnp.asarray(g, jnp.float32)),
            jax.device_put(jnp.asarray(L, jnp.float32)),
        )


@functools.lru_cache(maxsize=4)
def _circulant_sqrt_eigs(G: int, lengthscale: float, outputscale: float):
    """sqrt-eigenvalues of the circulant embedding of the RBF kernel on an
    equispaced G-point grid over [0, 1] (Dietrich-Newsam / Davies-Harte).

    The grid covariance K is Toeplitz; embed it in an M-point circulant
    (M = next power of two >= 8G so the kernel has decayed to ~1e-10 at the
    wrap distance M*h/2 ~ 4 for lengthscale 0.6) whose eigenvalues are the
    real FFT of its first row — computed HERE in float64 on the host, then
    sqrt'ed and cast to f32. Tiny negative eigenvalues from the finite
    embedding are clipped to 0 (recorded magnitude ~1e-10 * outputscale).

    Compared to the Cholesky-factor grid path this is O(M log M) per draw
    instead of O(B G^2), needs O(M) memory instead of the G x G factor
    (268 MB at G=8192 — which also overflows the axon remote-compile
    request limit as a program constant), and is exact for the stationary
    kernel by construction.
    """
    import numpy as np

    h = 1.0 / (G - 1)
    M = 1
    while M < 8 * G:
        M *= 2
    j = np.arange(M)
    d = np.minimum(j, M - j) * h
    c = outputscale * np.exp(-0.5 * (d / lengthscale) ** 2)
    lam = np.fft.fft(c).real  # symmetric row -> real spectrum
    lam = np.maximum(lam, 0.0)
    with jax.ensure_compile_time_eval():
        grid = jax.device_put(jnp.asarray(np.linspace(0.0, 1.0, G), jnp.float32))
        sqrt_lam = jax.device_put(jnp.asarray(np.sqrt(lam), jnp.float32))
    return grid, sqrt_lam, M


def _grid_latent_fft(k_f: jax.Array, batch_size: int, grid_size: int,
                     lengthscale: float, outputscale: float) -> jax.Array:
    """(batch_size, grid_size) draws of the latent GP on the grid via the
    circulant spectral factor: w = ifft(sqrt(lam) * eps) * sqrt(M) with
    eps = a + i b standard complex normals gives TWO independent real
    N(0, C) fields per complex draw (Re w, Im w)."""
    _, sqrt_lam, M = _circulant_sqrt_eigs(
        grid_size, float(lengthscale), float(outputscale)
    )
    n_complex = (batch_size + 1) // 2
    ka, kb = jax.random.split(k_f)
    a = jax.random.normal(ka, (n_complex, M), dtype=jnp.float32)
    b = jax.random.normal(kb, (n_complex, M), dtype=jnp.float32)
    eps = jax.lax.complex(a, b)
    w = jnp.fft.ifft(sqrt_lam.astype(jnp.complex64) * eps, axis=-1)
    w = w * jnp.sqrt(jnp.asarray(M, jnp.float32))
    f = jnp.concatenate([jnp.real(w), jnp.imag(w)], axis=0)[:batch_size]
    return f[:, :grid_size]


def gp_sample_paths_grid(
    key: jax.Array,
    batch_size: int,
    seq_len: int,
    grid_size: int,
    lengthscale: float,
    outputscale: float,
    noise,
    method: str = "fft",
) -> tuple[jax.Array, jax.Array]:
    """Grid fast path for 1-D GP prior sampling: returns (x (B,T,1), y (B,T)).

    Instead of factorizing a fresh (T, T) covariance per dataset per step
    (B sequential Choleskys that leave the MXU idle), draw the latent
    function on a fixed fine grid — f = z @ L^T with the PRECOMPUTED factor
    L of K(grid, grid) — and read each dataset's x locations off the grid:
    x = grid[idx], y = f[idx] + sqrt(noise) * eps. The per-step cost is one
    (B, G) x (G, G) matmul (pure MXU work) plus gathers; no Cholesky runs
    in the hot loop at all.

    Approximation vs the continuous sampler (reference fast_gp.py:44-56):
    x is discrete-uniform over G grid points instead of continuous U(0, 1).
    The induced y-difference for a point rounded to the grid is
    ~ (1/G)/lengthscale in f-space — at G=2048, lengthscale 0.6 that is
    ~8e-4, an order of magnitude below even the north-star noise STD (1e-2
    at noise=1e-4). Repeated x within a dataset get identical f (exact GP
    semantics). Opt-in via GPPrior(grid=G); hyperparameters must be static
    scalars (they key the cached factor).

    ``method``: 'fft' (default) draws the latent via the circulant spectral
    factor (O(B M log M), O(M) memory — required at G=8192 where the dense
    factor is 268 MB and overflows the axon remote-compile constant limit);
    'chol' uses the dense precomputed f64->f32 Cholesky factor matmul.
    """
    k_idx, k_f, k_n = jax.random.split(key, 3)
    if method == "fft":
        grid, _, _ = _circulant_sqrt_eigs(
            grid_size, float(lengthscale), float(outputscale)
        )
        f_grid = _grid_latent_fft(
            k_f, batch_size, grid_size, float(lengthscale), float(outputscale)
        )
    else:
        grid, L = _grid_factor(grid_size, float(lengthscale), float(outputscale))
        z = jax.random.normal(k_f, (batch_size, grid_size), dtype=jnp.float32)
        # HIGHEST precision: f32 factor feeding noise-scale-1e-2 observations
        # cannot tolerate the default bf16-pass matmul.
        f_grid = jax.lax.dot_general(
            z, L, (((1,), (1,)), ((), ())), precision=jax.lax.Precision.HIGHEST
        )  # (B, G) = z @ L.T
    idx = jax.random.randint(k_idx, (batch_size, seq_len), 0, grid_size)
    x = jnp.take(grid, idx)[..., None]
    f = jnp.take_along_axis(f_grid, idx, axis=1)
    y = f + jnp.sqrt(jnp.asarray(noise, jnp.float32)) * jax.random.normal(
        k_n, (batch_size, seq_len), dtype=jnp.float32
    )
    return x, y


def gp_posterior(
    x_train: jax.Array,
    y_train: jax.Array,
    x_query: jax.Array,
    lengthscale,
    outputscale,
    noise,
    kernel=rbf_kernel,
    jitter: float = 1e-6,
    context_mask: jax.Array | None = None,
    dtype=jnp.float32,
):
    """Exact GP posterior predictive (mean, variance) at query points.

    ``x_train``: (N, F), ``y_train``: (N,), ``x_query``: (M, F). If
    ``context_mask`` (N,) bool is given, masked-out rows are excluded from
    conditioning *without changing shapes*: their rows/columns of the train
    covariance are replaced by identity and their cross-covariances zeroed,
    which makes the Cholesky solve the submatrix system exactly — this is how
    the evaluation oracle sweeps context sizes t=1..T-1 in one batched call
    (replacing the per-t refit loop of reference priors/fast_gp.py:95-117).

    Returned variance *includes* observation noise (the reference scores
    ``likelihood(model(x))``, fast_gp.py:103-104).

    ``dtype``: pass jnp.float64 (with jax_enable_x64, CPU) for large-T
    oracle accuracy — at T≈2000 with noise 1e-4 the f32 path needs jitter
    ~1e-3 to factor, which inflates the predictive variance by ~10x; f64
    factors with negligible jitter.
    """
    with jax.default_matmul_precision("highest"):
        xt = x_train.astype(dtype)
        xq = x_query.astype(dtype)
        N = xt.shape[0]
        K = kernel(xt, xt, lengthscale, outputscale).astype(dtype)
        k_star = kernel(xt, xq, lengthscale, outputscale).astype(dtype)  # (N, M)
        y = y_train.astype(dtype)
        if context_mask is not None:
            m = context_mask.astype(dtype)
            K = K * m[:, None] * m[None, :] + jnp.diag(1.0 - m)
            k_star = k_star * m[:, None]
            y = y * m
            A = K + jnp.diag(m) * (noise + jitter)
        else:
            A = K + (noise + jitter) * jnp.eye(N, dtype=dtype)
        L = psd_safe_cholesky(A, initial_jitter=0.0)
        alpha = jax.scipy.linalg.cho_solve((L, True), y)
        mean = k_star.T @ alpha
        v = jax.scipy.linalg.solve_triangular(L, k_star, lower=True)
        # diag(K(xq, xq)) without materializing the (M, M) query kernel:
        # per-row self-evaluation (for stationary kernels this is just the
        # outputscale, but stay generic for any kernel callable).
        kqq_diag = jax.vmap(
            lambda p: kernel(p[None], p[None], lengthscale, outputscale)[0, 0]
        )(xq)
        var_f = kqq_diag - jnp.sum(v * v, axis=0)
        var = jnp.maximum(var_f, 0.0) + noise
        return mean, var
