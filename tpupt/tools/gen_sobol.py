"""Recover the compact Joe-Kuo Sobol initialization data.

The published Joe & Kuo dataset ("new-joe-kuo-6.21201",
web.maths.unsw.edu.au/~fkuo/sobol — the dataset pbrt's
core/sobolmatrices.cpp was generated from, per its header comment) defines
each dimension by (s = polynomial degree, a = packed coefficients of the
primitive polynomial x^s + a_1 x^{s-1} + ... + a_{s-1} x + 1, and s initial
direction numbers m_1..m_s). The generated 32-bit generator matrices are a
deterministic function of that data:

    m_k = 2 a_1 m_{k-1} XOR 4 a_2 m_{k-2} XOR ... XOR 2^{s-1} a_{s-1}
          m_{k-s+1} XOR 2^s m_{k-s} XOR m_{k-s}            (k >= s)
    v_k = m_k << (31 - k)                                  (column k)

This script inverts that map: it reads the generated matrices from the
reference snapshot, recovers (s, a, m_init) per dimension by solving the
recurrence for the polynomial coefficients over GF(2), verifies the
round-trip reproduces every matrix column exactly, and writes the compact
canonical dataset to tpupt/core/sobol_joekuo.npz. tpupt then re-generates
the matrices from this data at import (core/lowdiscrepancy.py) — the same
offline-generate scheme as sobolmatrices.cpp, storing the published
initialization constants instead of the 27k-line expansion.

Also captured: CMaxMinDist (lowdiscrepancy.cpp:249) — Gruenschloss &
Keller's published (0,2)-sequence generator matrices with maximized
minimum point distance, used by the maxmindist sampler (samplers/maxmin.h).

Run:  python -m tpupt.tools.gen_sobol [ref_src_dir] [out.npz]
"""

from __future__ import annotations

import re
import sys

import numpy as np

N_DIMS = 1024
MATRIX_SIZE = 52  # columns per dim in the reference table; we use 32


def _parse_array(text: str, decl: str) -> np.ndarray:
    """Extract the integer initializer list following `decl` in C++ text."""
    i = text.index(decl)
    j = text.index("{", i)
    k = text.index("};", j)
    vals = re.findall(r"0x[0-9a-fA-F]+|\b\d+\b", text[j:k])
    return np.array([int(v, 0) for v in vals], np.uint64)


def _regen(s: int, a: int, m_init: np.ndarray, n_bits: int = 32) -> np.ndarray:
    """Forward Joe-Kuo recurrence -> 32 matrix columns (uint32)."""
    m = list(int(x) for x in m_init)
    for k in range(s, n_bits):
        new = m[k - s] ^ (m[k - s] << s)
        for j in range(1, s):
            if (a >> (s - 1 - j)) & 1:
                new ^= m[k - j] << j
        m.append(new)
    v = np.zeros(n_bits, np.uint32)
    for k in range(n_bits):
        v[k] = np.uint32((m[k] << (31 - k)) & 0xFFFFFFFF)
    return v


def _solve_dim(cols: np.ndarray):
    """Recover (s, a, m_init) for one dimension from its 32 columns."""
    m = np.array([int(cols[k]) >> (31 - k) for k in range(32)], np.uint64)
    for s in range(1, 19):
        if s >= 32:
            break
        # unknowns: a_1..a_{s-1} (bits). equations: for k in s..31,
        #   XOR_j a_j * (m[k-j] << j)  ==  m[k] ^ m[k-s] ^ (m[k-s] << s)
        n_unk = s - 1
        rows, rhs = [], []
        for k in range(s, 32):
            target = int(m[k]) ^ int(m[k - s]) ^ (int(m[k - s]) << s)
            contrib = [int(m[k - j]) << j for j in range(1, s)]
            width = max([target] + contrib + [1]).bit_length()
            for b in range(width):
                rows.append([(c >> b) & 1 for c in contrib])
                rhs.append((target >> b) & 1)
        A = np.array(rows, np.uint8).reshape(len(rhs), n_unk) \
            if n_unk else np.zeros((len(rhs), 0), np.uint8)
        y = np.array(rhs, np.uint8)
        # GF(2) Gaussian elimination
        A = A.copy()
        y = y.copy()
        piv = []
        r = 0
        for c in range(n_unk):
            sel = np.nonzero(A[r:, c])[0]
            if sel.size == 0:
                piv.append(-1)
                continue
            p = r + sel[0]
            A[[r, p]] = A[[p, r]]
            y[[r, p]] = y[[p, r]]
            hit = np.nonzero(A[:, c])[0]
            hit = hit[hit != r]
            A[hit] ^= A[r]
            y[hit] ^= y[r]
            piv.append(r)
            r += 1
        if np.any(y[r:]):
            continue  # inconsistent -> wrong degree
        x = np.zeros(n_unk, np.uint8)
        for c, pr in enumerate(piv):
            if pr >= 0:
                x[c] = y[pr]
        a = 0
        for j in range(1, s):
            a |= int(x[j - 1]) << (s - 1 - j)
        if np.array_equal(_regen(s, a, m[:s]), cols.astype(np.uint32)):
            return s, a, m[:s].astype(np.uint32)
    return None


def main(ref_src="/root/reference/src/core", out=None):
    import os

    out = out or os.path.join(os.path.dirname(__file__), "..", "core",
                              "sobol_joekuo.npz")
    text = open(f"{ref_src}/sobolmatrices.cpp").read()
    flat = _parse_array(text, "SobolMatrices32[")
    M = flat.reshape(N_DIMS, MATRIX_SIZE)[:, :32].astype(np.uint32)

    ld = open(f"{ref_src}/lowdiscrepancy.cpp").read()
    cmaxmin = _parse_array(ld, "CMaxMinDist[17][32]").astype(
        np.uint32).reshape(17, 32)

    s_arr = np.zeros(N_DIMS, np.uint8)
    a_arr = np.zeros(N_DIMS, np.uint32)
    m_off = np.zeros(N_DIMS + 1, np.int32)
    m_flat = []
    # dim 0 is the van der Corput identity matrix (not Joe-Kuo data)
    assert np.array_equal(M[0], (np.uint32(1) << np.arange(31, -1, -1,
                                                           dtype=np.uint32)))
    for d in range(1, N_DIMS):
        got = _solve_dim(M[d])
        assert got is not None, f"dim {d}: no consistent Joe-Kuo recurrence"
        s, a, m_init = got
        s_arr[d] = s
        a_arr[d] = a
        m_off[d + 1] = m_off[d] + s
        m_flat.extend(int(x) for x in m_init)
        if d <= 3 or d % 256 == 0:
            print(f"dim {d}: s={s} a={a:#x} m={list(m_init)}")
    m_off[1] = 0  # dim 0 contributes nothing
    np.savez_compressed(out, s=s_arr, a=a_arr,
                        m_off=m_off, m=np.array(m_flat, np.uint32),
                        cmaxmindist=cmaxmin)
    print(f"wrote {out}: {len(m_flat)} init numbers, "
          f"max degree {int(s_arr.max())}")


if __name__ == "__main__":
    main(*sys.argv[1:])
