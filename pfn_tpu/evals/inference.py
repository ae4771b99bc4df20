"""Approximate-inference oracles in pure JAX: SVI (diagonal-normal guide),
adaptive HMC, and SVGD.

These replace the reference's Pyro machinery (AutoDiagonalNormal + Trace_ELBO
SVI, NUTS MCMC, SVGD — reference mcmc_svi_transformer_on_bayesian.py:211-267,
tabular.py:414-462). They are *oracles the PFN is compared against*, not the
product (SURVEY.md §7 step 6), so the goal is asymptotic correctness and a
matching API, with everything jittable.

Deviation note: the reference uses Pyro's NUTS; here :func:`hmc` is adaptive
HMC (dual-averaging step size, fixed path length) — the same role (an
asymptotically exact sampler), simpler and TPU-friendly. SVGD matches the
reference's optional SVGD path (mcmc_svi…py:222-232).

All model log-densities are functions ``log_joint(params_pytree) -> scalar``.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.flatten_util
import jax.numpy as jnp
import optax


# ---------------------------------------------------------------------------
# SVI with a diagonal-normal guide (AutoDiagonalNormal parity)
# ---------------------------------------------------------------------------

class SVIResult(NamedTuple):
    mu: Any
    log_sigma: Any
    losses: jax.Array

    def sample(self, key: jax.Array, num_samples: int = 1):
        """Draw parameter samples from the fitted guide."""
        leaves, treedef = jax.tree_util.tree_flatten(self.mu)
        sig_leaves = jax.tree_util.tree_leaves(self.log_sigma)
        keys = jax.random.split(key, len(leaves))

        def one(m, ls, k):
            return m + jnp.exp(ls) * jax.random.normal(
                k, (num_samples,) + m.shape, m.dtype
            )

        sampled = [one(m, ls, k) for m, ls, k in zip(leaves, sig_leaves, keys)]
        return jax.tree_util.tree_unflatten(treedef, sampled)


def svi(
    log_joint: Callable,
    init_params: Any,
    key: jax.Array,
    num_steps: int = 400,
    lr: float = 1e-3,
    num_particles: int = 1,
) -> SVIResult:
    """Fit q(theta) = N(mu, diag(sigma^2)) by maximizing the ELBO with the
    reparameterization trick (Trace_ELBO parity, one particle by default)."""
    mu0 = jax.tree.map(jnp.asarray, init_params)
    log_sigma0 = jax.tree.map(lambda p: jnp.full_like(p, -2.3), mu0)  # sigma~0.1
    var_params = (mu0, log_sigma0)
    tx = optax.adam(lr)
    opt_state = tx.init(var_params)

    def elbo_loss(vp, k):
        mu, log_sigma = vp

        def one_particle(kk):
            leaves, treedef = jax.tree_util.tree_flatten(mu)
            sig = jax.tree_util.tree_leaves(log_sigma)
            keys = jax.random.split(kk, len(leaves))
            eps = [jax.random.normal(kx, m.shape, m.dtype) for kx, m in zip(keys, leaves)]
            theta = [m + jnp.exp(ls) * e for m, ls, e in zip(leaves, sig, eps)]
            theta_tree = jax.tree_util.tree_unflatten(treedef, theta)
            # log q(theta) for the diagonal gaussian.
            log_q = sum(
                jnp.sum(
                    -0.5 * e**2 - ls - 0.5 * jnp.log(2 * jnp.pi)
                )
                for e, ls in zip(eps, sig)
            )
            return log_joint(theta_tree) - log_q

        ks = jax.random.split(k, num_particles)
        return -jnp.mean(jax.vmap(one_particle)(ks))

    @jax.jit
    def step(carry, k):
        vp, opt_state = carry
        loss, grads = jax.value_and_grad(elbo_loss)(vp, k)
        updates, opt_state = tx.update(grads, opt_state, vp)
        vp = optax.apply_updates(vp, updates)
        return (vp, opt_state), loss

    keys = jax.random.split(key, num_steps)
    (var_params, _), losses = jax.lax.scan(step, (var_params, opt_state), keys)
    return SVIResult(mu=var_params[0], log_sigma=var_params[1], losses=losses)


# ---------------------------------------------------------------------------
# Adaptive HMC (the NUTS-role oracle)
# ---------------------------------------------------------------------------

def hmc(
    log_prob: Callable,
    init_params: Any,
    key: jax.Array,
    num_samples: int = 500,
    num_warmup: int = 300,
    num_leapfrog: int = 20,
    init_step_size: float = 0.1,
    target_accept: float = 0.8,
):
    """Adaptive HMC over a pytree of parameters.

    Warmup adapts the step size by dual averaging toward ``target_accept``;
    sampling keeps it fixed. Returns (samples_pytree with leading axis
    num_samples, accept_rate).
    """
    flat0, unravel = jax.flatten_util.ravel_pytree(init_params)
    lp = lambda q: log_prob(unravel(q))
    grad_lp = jax.grad(lp)

    def leapfrog(q, p, eps):
        p = p + 0.5 * eps * grad_lp(q)

        def body(_, qp):
            q, p = qp
            q = q + eps * p
            p = p + eps * grad_lp(q)
            return (q, p)

        q, p = jax.lax.fori_loop(0, num_leapfrog - 1, body, (q, p))
        q = q + eps * p
        p = p + 0.5 * eps * grad_lp(q)
        return q, p

    def hmc_step(q, key, eps):
        k1, k2 = jax.random.split(key)
        p = jax.random.normal(k1, q.shape)
        h0 = lp(q) - 0.5 * jnp.sum(p**2)
        q_new, p_new = leapfrog(q, p, eps)
        h1 = lp(q_new) - 0.5 * jnp.sum(p_new**2)
        log_accept = jnp.minimum(0.0, h1 - h0)
        # A diverged trajectory (NaN energy) must count as a rejection, both
        # in the dynamics (NaN comparisons are False) and in the recorded
        # acceptance statistic fed to dual averaging.
        accept = jnp.log(jax.random.uniform(k2)) < log_accept
        q = jnp.where(accept, q_new, q)
        return q, jnp.nan_to_num(jnp.exp(log_accept))

    # Dual-averaging warmup (Hoffman & Gelman 2014 notation).
    mu_da = jnp.log(10.0 * init_step_size)
    gamma, t0, kappa = 0.05, 10.0, 0.75

    def warmup_body(carry, key):
        q, log_eps, log_eps_bar, h_bar, t = carry
        q, a = hmc_step(q, key, jnp.exp(log_eps))
        t = t + 1.0
        h_bar = (1 - 1 / (t + t0)) * h_bar + (target_accept - a) / (t + t0)
        log_eps = mu_da - jnp.sqrt(t) / gamma * h_bar
        w = t ** (-kappa)
        log_eps_bar = w * log_eps + (1 - w) * log_eps_bar
        return (q, log_eps, log_eps_bar, h_bar, t), a

    @jax.jit
    def run(key):
        kw, ks = jax.random.split(key)
        carry = (flat0, jnp.log(init_step_size), jnp.log(init_step_size), 0.0, 0.0)
        carry, _ = jax.lax.scan(warmup_body, carry, jax.random.split(kw, num_warmup))
        q, _, log_eps_bar, _, _ = carry
        eps = jnp.exp(log_eps_bar)

        def sample_body(q, key):
            q, a = hmc_step(q, key, eps)
            return q, (q, a)

        _, (qs, accepts) = jax.lax.scan(sample_body, q, jax.random.split(ks, num_samples))
        return qs, accepts.mean()

    qs, accept_rate = run(key)
    samples = jax.vmap(unravel)(qs)
    return samples, accept_rate


# ---------------------------------------------------------------------------
# SVGD (Stein variational gradient descent)
# ---------------------------------------------------------------------------

def svgd(
    log_prob: Callable,
    init_particles: jax.Array,  # (n_particles, dim)
    key: jax.Array,
    num_steps: int = 500,
    lr: float = 1e-2,
):
    """SVGD with an RBF kernel and the median heuristic bandwidth (the
    reference's optional SVGD path, mcmc_svi…py:222-232). Particles are flat
    vectors; use jax.flatten_util.ravel_pytree to adapt."""
    grad_lp = jax.vmap(jax.grad(log_prob))

    def kernel_and_grad(x):
        n = x.shape[0]
        d2 = jnp.sum((x[:, None, :] - x[None, :, :]) ** 2, -1)
        med2 = jnp.median(d2)
        h = jnp.sqrt(0.5 * med2 / jnp.log(n + 1.0)) + 1e-8
        K = jnp.exp(-d2 / (2 * h**2))
        # dK[i, j] = (x_i - x_j)/h^2 * K[i, j] == grad_{x_j} k(x_j, x_i);
        # the repulsion term is sum_j dK[i, j] (axis=1 — axis=0 flips the
        # sign and collapses particles onto the mode).
        dK = (x[:, None, :] - x[None, :, :]) / (h**2) * K[..., None]
        return K, dK

    @jax.jit
    def step(x, _):
        K, dK = kernel_and_grad(x)
        glp = grad_lp(x)
        phi = (K @ glp + jnp.sum(dK, axis=1)) / x.shape[0]
        return x + lr * phi, None

    x, _ = jax.lax.scan(step, init_particles, None, length=num_steps)
    return x
