"""Independent pure-loop GLCM oracle (SURVEY.md §5.2).

Deliberately written from the §1.3 formulas with naive Python loops and
NO imports from glcmstream.kernel, so kernel bugs can't hide in a shared
implementation. Slow — only for tiny test planes.
"""

from __future__ import annotations

import math

import numpy as np


def oracle_glcm(plane, dr, dc, levels, symmetric=True, normed=True):
    h, w = plane.shape
    C = np.zeros((levels, levels), dtype=np.float64)
    for r in range(h):
        for c in range(w):
            r2, c2 = r + dr, c + dc
            if 0 <= r2 < h and 0 <= c2 < w:
                C[plane[r, c], plane[r2, c2]] += 1
    if symmetric:
        C = C + C.T
    if normed:
        s = C.sum()
        if s > 0:
            C = C / s
    return C


def oracle_haralick(P):
    L = P.shape[0]
    contrast = dissim = homog = asm = mu_i = mu_j = 0.0
    for i in range(L):
        for j in range(L):
            p = P[i, j]
            contrast += p * (i - j) ** 2
            dissim += p * abs(i - j)
            homog += p / (1.0 + (i - j) ** 2)
            asm += p * p
            mu_i += p * i
            mu_j += p * j
    var_i = var_j = cov = 0.0
    for i in range(L):
        for j in range(L):
            p = P[i, j]
            var_i += p * (i - mu_i) ** 2
            var_j += p * (j - mu_j) ** 2
            cov += p * (i - mu_i) * (j - mu_j)
    denom = math.sqrt(var_i * var_j)
    corr = cov / denom if denom > 0 else 1.0
    return {
        "contrast": contrast,
        "dissimilarity": dissim,
        "homogeneity": homog,
        "energy": math.sqrt(asm),
        "correlation": corr,
        "asm": asm,
    }


def oracle_rendertile_contrast(plane, ws, dr, dc, levels):
    """Naive sliding-window contrast map: one symmetric+normed GLCM per
    ws×ws window, property of that GLCM."""
    return oracle_rendertile_map(plane, ws, dr, dc, levels)["contrast"]


def oracle_rendertile_map(plane, ws, dr, dc, levels):
    """Naive sliding-window property maps for ALL six Haralick features:
    one symmetric+normed GLCM per ws×ws window, feature of that GLCM."""
    h, w = plane.shape
    oh, ow = h - ws + 1, w - ws + 1
    out = {k: np.zeros((oh, ow)) for k in
           ("contrast", "dissimilarity", "homogeneity",
            "energy", "correlation", "asm")}
    for r in range(oh):
        for c in range(ow):
            win = plane[r:r + ws, c:c + ws]
            P = oracle_glcm(win, dr, dc, levels, symmetric=True, normed=True)
            feats = oracle_haralick(P)
            for k in out:
                out[k][r, c] = feats[k]
    return out
