"""Kalman filtering: linear KF + extended KF on manifolds.

Reference parity: linear/KalmanFilter.h:89 (linear KF expressed as elimination
on a two-variable chain — here in the equivalent covariance form, batched and
scan-friendly) and nonlinear/ExtendedKalmanFilter.h (EKF via relinearization).
"""

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from gtsam_personal_tpu.core import manifolds


class GaussianState(NamedTuple):
    mean: jnp.ndarray    # [d] or manifold point
    cov: jnp.ndarray     # [d, d] tangent covariance


def kf_predict(state: GaussianState, F, B, u, Q) -> GaussianState:
    """x' = F x + B u + w, w ~ N(0, Q) (KalmanFilter::predict)."""
    return GaussianState(F @ state.mean + B @ u, F @ state.cov @ F.T + Q)


def kf_update(state: GaussianState, H, z, R) -> GaussianState:
    """Measurement z = H x + v, v ~ N(0, R) (KalmanFilter::update)."""
    S = H @ state.cov @ H.T + R
    K = jnp.linalg.solve(S, H @ state.cov).T
    mean = state.mean + K @ (z - H @ state.mean)
    d = state.mean.shape[0]
    P = (jnp.eye(d, dtype=state.cov.dtype) - K @ H) @ state.cov
    return GaussianState(mean, 0.5 * (P + P.T))


def kf_run(state: GaussianState, F, B, Q, H, R, us, zs) -> GaussianState:
    """Whole filter as one lax.scan over (controls, measurements)."""
    def step(s, inp):
        u, z = inp
        s = kf_predict(s, F, B, u, Q)
        s = kf_update(s, H, z, R)
        return s, s.mean

    final, means = jax.lax.scan(step, state, (us, zs))
    return final, means


class ExtendedKalmanFilter:
    """EKF over a manifold-valued state (reference:
    nonlinear/ExtendedKalmanFilter.h — there realized as two-factor
    elimination; here as the equivalent tangent-space covariance recursion
    with autodiff Jacobians)."""

    def __init__(self, group: str, x0, P0):
        self.m = manifolds.get(group)
        self.state = GaussianState(x0, P0)

    def predict(self, motion: Callable, Q):
        """x' = motion(x); F = d local(motion(x), motion(x ⊞ d))/dd at 0."""
        x = self.state.mean
        fx = motion(x)

        def lifted(d):
            return self.m.local(fx, motion(self.m.retract(x, d)))

        F = jax.jacfwd(lifted)(jnp.zeros(self.m.dim, dtype=self.state.cov.dtype))
        P = F @ self.state.cov @ F.T + Q
        self.state = GaussianState(fx, P)
        return self.state

    def update(self, h: Callable, z, R):
        """Measurement z = h(x) + v."""
        x = self.state.mean
        hx = h(x)

        def lifted(d):
            return h(self.m.retract(x, d))

        H = jax.jacfwd(lifted)(jnp.zeros(self.m.dim, dtype=self.state.cov.dtype))
        S = H @ self.state.cov @ H.T + R
        K = jnp.linalg.solve(S, H @ self.state.cov).T
        delta = K @ (z - hx)
        mean = self.m.retract(x, delta)
        d = self.m.dim
        P = (jnp.eye(d, dtype=self.state.cov.dtype) - K @ H) @ self.state.cov
        self.state = GaussianState(mean, 0.5 * (P + P.T))
        return self.state
