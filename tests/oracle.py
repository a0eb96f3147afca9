"""Independent NumPy float64 oracle for the Gaussian-medium math.

Deliberately written in scalar/loop style from the published closed forms
(Condor et al. 2025 "Don't Splat your Gaussians"; reference
gaussian.h:111-231) so it shares no code with the JAX implementation under
test.
"""

from __future__ import annotations

import math

import numpy as np

R_CUT = 3.0


class OracleGaussian:
    def __init__(self, mean, cov, density, albedo):
        self.mean = np.asarray(mean, np.float64)
        self.cov = np.asarray(cov, np.float64)
        self.inv = np.linalg.inv(self.cov)
        self.norm = (2 * np.pi) ** -1.5 * np.linalg.det(self.cov) ** -0.5
        self.density = float(density)
        self.albedo = float(albedo)

    def evaluate(self, x):
        d = np.asarray(x, np.float64) - self.mean
        return self.norm * math.exp(-0.5 * d @ self.inv @ d)

    def mu_t(self, x):
        return self.density * self.evaluate(x)

    def quad(self, o, d):
        p = np.asarray(o, np.float64) - self.mean
        md = self.inv @ np.asarray(d, np.float64)
        a = d @ md
        b = 2.0 * p @ md
        c = p @ (self.inv @ p)
        return a, b, c

    def intersect(self, o, d):
        a, b, c = self.quad(o, d)
        disc = b * b - 4 * a * (c - R_CUT * R_CUT)
        if disc < 0:
            return None
        s = math.sqrt(disc)
        t0 = (-b - s) / (2 * a)
        t1 = (-b + s) / (2 * a)
        if t1 < 0:
            return None
        return max(t0, 0.0), t1

    def optical_depth(self, o, d, u, v):
        a, b, c = self.quad(o, d)
        pref = self.density * self.norm * math.sqrt(math.pi / (2 * a))
        f = lambda t: math.erf((b + 2 * a * t) / (2 * math.sqrt(2 * a)))
        return pref * math.exp(-0.5 * (c - b * b / (4 * a))) * (f(v) - f(u))


class OracleMixture:
    def __init__(self, gaussians):
        self.g = list(gaussians)

    @staticmethod
    def random(rng, n, box=1.0, sigma=(0.05, 0.3), density=(0.2, 3.0)):
        gs = []
        for _ in range(n):
            mean = rng.uniform(-box, box, 3)
            q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
            s = rng.uniform(*sigma, 3)
            cov = q @ np.diag(s * s) @ q.T
            gs.append(OracleGaussian(mean, cov, rng.uniform(*density),
                                     rng.uniform(0.1, 0.95)))
        return OracleMixture(gs)

    def to_scene_text(self):
        lines = []
        for g in self.g:
            c = g.cov
            lines.append(
                "g " + " ".join(f"{v:.9g}" for v in [
                    *g.mean, c[0, 0], c[0, 1], c[0, 2], c[1, 1], c[1, 2],
                    c[2, 2], g.density, g.albedo]))
        return "\n".join(lines) + "\n"

    def tau_up_to(self, o, d, t):
        total = 0.0
        for g in self.g:
            hit = g.intersect(o, d)
            if hit is None:
                continue
            a, b = hit
            b = min(b, t)
            if b > a:
                total += g.optical_depth(o, d, a, b)
        return total

    def transmittance(self, o, d, t):
        return math.exp(-self.tau_up_to(o, d, t))

    def far_bound(self, o, d):
        out = 0.0
        for g in self.g:
            hit = g.intersect(o, d)
            if hit is not None:
                out = max(out, hit[1])
        return out

    def sigma_t(self, x, o=None, d=None, t=None):
        """Extinction at point x counting only Gaussians whose interval
        contains t (when ray context given) else all."""
        tot = 0.0
        for g in self.g:
            if o is not None:
                hit = g.intersect(o, d)
                if hit is None or not (hit[0] <= t <= hit[1]):
                    continue
            tot += g.mu_t(x)
        return tot

    def tau_quadrature(self, o, d, t, n=200000):
        """Brute-force quadrature of the clipped extinction integral."""
        ts = np.linspace(0.0, t, n)
        o = np.asarray(o, np.float64)
        d = np.asarray(d, np.float64)
        vals = np.zeros(n)
        for g in self.g:
            hit = g.intersect(o, d)
            if hit is None:
                continue
            mask = (ts >= hit[0]) & (ts <= min(hit[1], t))
            if not mask.any():
                continue
            pts = o[None, :] + ts[mask, None] * d[None, :]
            dd = pts - g.mean
            expo = -0.5 * np.einsum("ki,ij,kj->k", dd, g.inv, dd)
            vals[mask] += g.density * g.norm * np.exp(expo)
        return np.trapezoid(vals, ts)
