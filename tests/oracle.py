"""Independent loop-based fp64 oracle for the Yee leapfrog scheme.

This is a deliberately naive, triple-loop transliteration of the update
*equations* (description.pdf App. A; loop bounds per SURVEY section 2
component table) used as ground truth for small grids.  It mirrors the C
reference's observable semantics — PEC bounds, double source application,
hard-source patch arithmetic — without sharing any code with it or with the
framework's vectorized ops.
"""

from __future__ import annotations

import math

import numpy as np

MU = 1.25663706143591729538505735331180115367886775975e-6
EPSILON = 8.854e-12
PI = 3.14159265358979323846264338327950288419716939937510582097494
CELERITY = 299792458.0


class OracleSim:
    def __init__(self, p):
        self.p = p
        K1, J1, I1 = p.maxk + 1, p.maxj + 1, p.maxi + 1
        shape = (K1, J1, I1)
        self.ex = np.zeros(shape)
        self.ey = np.zeros(shape)
        self.ez = np.zeros(shape)
        self.hx = np.zeros(shape)
        self.hy = np.zeros(shape)
        self.hz = np.zeros(shape)

    def set_initial_te101(self):
        p = self.p
        d = p.spatial_step
        for k in range(p.maxk + 1):
            for j in range(p.maxj):
                for i in range(p.maxi + 1):
                    self.ey[k, j, i] = math.sin(PI * k * d / p.height) * math.sin(
                        PI * i * d / p.length
                    )

    def update_h(self):
        p = self.p
        K, J, I = p.maxk, p.maxj, p.maxi
        f = p.time_step / (MU * p.spatial_step)
        ex, ey, ez = self.ex, self.ey, self.ez
        for k in range(K):
            for j in range(J):
                for i in range(I + 1):
                    self.hx[k, j, i] += f * (
                        (ey[k + 1, j, i] - ey[k, j, i]) - (ez[k, j + 1, i] - ez[k, j, i])
                    )
        for k in range(K):
            for j in range(J + 1):
                for i in range(I):
                    self.hy[k, j, i] += f * (
                        (ez[k, j, i + 1] - ez[k, j, i]) - (ex[k + 1, j, i] - ex[k, j, i])
                    )
        for k in range(K + 1):
            for j in range(J):
                for i in range(I):
                    self.hz[k, j, i] += f * (
                        (ex[k, j + 1, i] - ex[k, j, i]) - (ey[k, j, i + 1] - ey[k, j, i])
                    )

    def update_e(self):
        p = self.p
        K, J, I = p.maxk, p.maxj, p.maxi
        f = p.time_step / (EPSILON * p.spatial_step)
        hx, hy, hz = self.hx, self.hy, self.hz
        for k in range(1, K):
            for j in range(1, J):
                for i in range(I):
                    self.ex[k, j, i] += f * (
                        (hz[k, j, i] - hz[k, j - 1, i]) - (hy[k, j, i] - hy[k - 1, j, i])
                    )
        for k in range(1, K):
            for j in range(J):
                for i in range(1, I):
                    self.ey[k, j, i] += f * (
                        (hx[k, j, i] - hx[k - 1, j, i]) - (hz[k, j, i] - hz[k, j, i - 1])
                    )
        for k in range(K):
            for j in range(1, J):
                for i in range(1, I):
                    self.ez[k, j, i] += f * (
                        (hy[k, j, i] - hy[k, j, i - 1]) - (hx[k, j, i] - hx[k, j - 1, i])
                    )

    def set_source(self, t):
        p = self.p
        cfg = p.source
        d = p.spatial_step
        min_y = p.width / 2.0 - cfg.aprime / 2.0
        max_y = min_y + cfg.aprime
        min_x = p.length / 2.0 - cfg.bprime / 2.0
        max_x = min_x + cfg.bprime
        j0 = int(min_y / d) - 1
        j1 = int(max_y / d) + 1
        i0 = int(min_x / d) - 1
        i1 = int(max_x / d) + 1
        f_mnl = 0.5 * CELERITY * math.sqrt((PI / p.width) ** 2 + (PI / p.length) ** 2) / PI
        omega = 2.0 * PI * f_mnl
        z_te = (omega * MU) / math.sqrt(omega**2 * MU * EPSILON - (PI / p.width) ** 2)
        amp = math.sin(2.0 * PI * cfg.frequency * t)
        for si, i in enumerate(range(i0, i1)):
            prof = math.sin(PI * (si * d) / cfg.aprime)
            for j in range(j0, j1):
                self.ez[0, j, i] = amp * prof
                self.ex[0, j, i] = 0.0
                self.hz[0, j, i] = 0.0
                self.hx[0, j, i] = -(1.0 / z_te) * amp * prof

    def step(self, t, computation: bool):
        if computation:
            self.set_source(t)
        self.update_h()
        if computation:
            self.set_source(t)
        self.update_e()

    def e_energy(self, quirk_compat: bool = False) -> float:
        p = self.p
        K, J, I = p.maxk, p.maxj, p.maxi
        dv = p.spatial_step**3
        ex, ey, ez = self.ex, self.ey, self.ez
        acc = 0.0
        ez_flat = ez[:K, : J + 1, : I + 1].reshape(-1)
        for k in range(K):
            for j in range(J):
                for i in range(I):
                    mex = (ex[k, j, i] + ex[k + 1, j, i] + ex[k, j + 1, i] + ex[k + 1, j + 1, i]) / 4.0
                    mey = (ey[k, j, i] + ey[k, j, i + 1] + ey[k + 1, j, i] + ey[k + 1, j, i + 1]) / 4.0
                    if quirk_compat:
                        khz = lambda ii, jj, kk: ii + jj * I + kk * I * J
                        mez = (
                            ez_flat[khz(i, j, k)]
                            + ez_flat[khz(i, j + 1, k)]
                            + ez_flat[khz(i + 1, j, k)]
                            + ez_flat[khz(i + 1, j + 1, k)]
                        ) / 4.0
                    else:
                        mez = (ez[k, j, i] + ez[k, j + 1, i] + ez[k, j, i + 1] + ez[k, j + 1, i + 1]) / 4.0
                    acc += (mex**2 + mey**2 + mez**2) * dv
        return acc * EPSILON / 2.0

    def h_energy(self) -> float:
        p = self.p
        K, J, I = p.maxk, p.maxj, p.maxi
        dv = p.spatial_step**3
        hx, hy, hz = self.hx, self.hy, self.hz
        acc = 0.0
        for k in range(K):
            for j in range(J):
                for i in range(I):
                    mhx = (hx[k, j, i] + hx[k, j, i + 1]) / 2.0
                    mhy = (hy[k, j, i] + hy[k, j + 1, i]) / 2.0
                    mhz = (hz[k, j, i] + hz[k + 1, j, i]) / 2.0
                    acc += (mhx**2 + mhy**2 + mhz**2) * dv
        return acc * MU / 2.0
