"""Deterministic MaxQuant-shaped fixtures (FIXTURES.md §1/§2/§5).

Small proteinGroups-like TSV: N features × (2 groups × 3 replicates ×
2 technical) samples, group-correlated missingness, a labeled subset of
features with a known log2 fold-change, reverse/contaminant flags.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

GROUPS = ["Control", "PGE2"]
REPLICATES = [1, 2, 3]
TECHNICAL = [1, 2]


def sample_labels() -> list[str]:
    return [
        f"{g}_{r}_{t}" for g in GROUPS for r in REPLICATES for t in TECHNICAL
    ]


def make_protein_groups(
    n_features: int = 200, seed: int = 42, fc_features: int = 20,
    log2_fc: float = 2.0,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Returns (proteinGroups frame, design frame)."""
    rng = np.random.default_rng(seed)
    labels = sample_labels()
    base = rng.normal(24.0, 2.0, size=n_features)  # log2 intensity
    noise = rng.normal(0.0, 0.5, size=(n_features, len(labels)))
    mat = base[:, None] + noise
    # Known signal: first fc_features up in PGE2.
    for j, lab in enumerate(labels):
        if lab.startswith("PGE2"):
            mat[:fc_features, j] += log2_fc
    # Missingness: 10% random + features 180+ fully missing in PGE2.
    miss = rng.random(mat.shape) < 0.10
    for j, lab in enumerate(labels):
        if lab.startswith("PGE2"):
            miss[180:, j] = True
    intensities = np.power(2.0, mat)
    intensities[miss] = 0.0  # MaxQuant writes 0 for not-detected

    df = pd.DataFrame({"id": np.arange(n_features)})
    df["Protein IDs"] = [
        f"P{i:05d};Q{i:05d}" if i % 3 == 0 else f"P{i:05d}"
        for i in range(n_features)
    ]
    df["Proteins"] = df["Protein IDs"]
    df["Gene names"] = [f"GENE{i}" for i in range(n_features)]
    df["Protein names"] = [f"Protein number {i}" for i in range(n_features)]
    rev = rng.random(n_features) < 0.02
    con = rng.random(n_features) < 0.03
    obs = rng.random(n_features) < 0.02
    df["Reverse"] = np.where(rev, "+", "")
    df["Potential contaminant"] = np.where(con, "+", "")
    df["Only identified by site"] = np.where(obs, "+", "")
    df["Unique peptides"] = rng.integers(1, 30, n_features)
    df["Intensity"] = intensities.sum(axis=1)
    for j, lab in enumerate(labels):
        df[f"Intensity {lab}"] = intensities[:, j]
        df[f"LFQ intensity {lab}"] = intensities[:, j] * 0.9
    # SILAC-style normalized ratios (entry point B, SURVEY §3.2): three
    # experiments; first fc_features carry a real 2^log2_fc ratio shift.
    for e in range(1, 4):
        ratio = np.exp2(rng.normal(0.0, 0.4, size=n_features))
        ratio[:fc_features] *= 2.0**log2_fc
        miss_r = rng.random(n_features) < 0.15
        ratio[miss_r] = np.nan
        df[f"Ratio H/L normalized E{e}"] = ratio
    design = pd.DataFrame(
        {
            "Label": labels,
            "Group": [lab.split("_")[0] for lab in labels],
            "Replicate": [int(lab.split("_")[1]) for lab in labels],
            "Technical": [int(lab.split("_")[2]) for lab in labels],
        }
    )
    return df, design


def write_fixture(tmpdir: str, **kw) -> tuple[str, str]:
    df, design = make_protein_groups(**kw)
    pg = f"{tmpdir}/proteinGroups.txt"
    ds = f"{tmpdir}/design.csv"
    df.to_csv(pg, sep="\t", index=False)
    design.to_csv(ds, index=False)
    return pg, ds
