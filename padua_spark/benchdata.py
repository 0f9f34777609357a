"""Deterministic MaxQuant-shaped synthetic fixtures for the macro
(end-to-end pipeline) benchmark entries.

The single-operator bench rows can't see cross-operator plan health —
fusion across stages, shared scans, where a checkpoint belongs — which
is exactly what a real padua migration hits first. These fixtures give
:mod:`padua_spark.pipelines` a file-shaped input (MaxQuant TSV +
design CSV, the reference's ingestion format: padua ``io.py:11``
``read_maxquant``) at a size proportional to the benchmark scale
factor, generated ONCE per (sf, n_features) and reused across passes
so generation cost never pollutes the timed region (bench.py
pre-generates in its warm phase).

Shape mirrors tests/fixtures.py's small unit fixture (FIXTURES.md
§1/§2/§5): N features x (2 groups x 3 replicates x 2 technical)
intensity columns with group-correlated missingness and a planted
log2 fold-change block, reverse/contaminant/site flags, and three
SILAC-style normalized-ratio experiment columns — but sized for the
macro bench and versioned by a layout tag so stale caches self-evict.
"""

from __future__ import annotations

import os
import re

import numpy as np
import pandas as pd

_LAYOUT_TAG = "v1"
GROUPS = ["Control", "PGE2"]
_LABELS = [
    f"{g}_{r}_{t}" for g in GROUPS for r in (1, 2, 3) for t in (1, 2)
]


def features_for_sf(sf_dir: str) -> int:
    """Fixture width from the scale-factor directory name: 600k
    features at sf=1 (the lineitem row-count convention of the
    testdata), floored at 2k so smoke scales still exercise every
    pipeline stage."""
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.01
    return max(2000, int(600_000 * sf))


def make_maxquant_tables(
    n_features: int, seed: int = 42, fc_features_frac: float = 0.1,
    log2_fc: float = 2.0,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Returns (proteinGroups/sites-shaped frame, design frame) —
    fully vectorized, deterministic in (n_features, seed)."""
    rng = np.random.default_rng(seed)
    fc_features = max(1, int(n_features * fc_features_frac))
    base = rng.normal(24.0, 2.0, size=n_features)
    noise = rng.normal(0.0, 0.5, size=(n_features, len(_LABELS)))
    mat = base[:, None] + noise
    is_pge2 = np.array([lab.startswith("PGE2") for lab in _LABELS])
    mat[:fc_features, is_pge2] += log2_fc
    miss = rng.random(mat.shape) < 0.10
    # a tail block fully missing in the treated group (MNAR pattern)
    tail = int(n_features * 0.9)
    miss[tail:, is_pge2] = True
    intensities = np.power(2.0, mat)
    intensities[miss] = 0.0  # MaxQuant writes 0 for not-detected

    ids = np.arange(n_features)
    df = pd.DataFrame({"id": ids})
    multi = ids % 3 == 0
    p = np.char.add("P", np.char.zfill(ids.astype(str), 6))
    q = np.char.add(";Q", np.char.zfill(ids.astype(str), 6))
    df["Protein IDs"] = np.where(multi, np.char.add(p, q), p)
    df["Proteins"] = df["Protein IDs"]
    df["Gene names"] = np.char.add("GENE", ids.astype(str))
    df["Localization prob"] = rng.uniform(0.3, 1.0, n_features).round(4)
    df["Reverse"] = np.where(rng.random(n_features) < 0.02, "+", "")
    df["Potential contaminant"] = np.where(
        rng.random(n_features) < 0.03, "+", ""
    )
    df["Only identified by site"] = np.where(
        rng.random(n_features) < 0.02, "+", ""
    )
    df["Unique peptides"] = rng.integers(1, 30, n_features)
    df["Intensity"] = intensities.sum(axis=1)
    for j, lab in enumerate(_LABELS):
        df[f"Intensity {lab}"] = intensities[:, j]
        df[f"LFQ intensity {lab}"] = intensities[:, j] * 0.9
    for e in (1, 2, 3):
        ratio = np.exp2(rng.normal(0.0, 0.4, size=n_features))
        ratio[:fc_features] *= 2.0**log2_fc
        ratio[rng.random(n_features) < 0.15] = np.nan
        df[f"Ratio H/L normalized E{e}"] = ratio
    design = pd.DataFrame(
        {
            "Label": _LABELS,
            "Group": [lab.split("_")[0] for lab in _LABELS],
            "Replicate": [int(lab.split("_")[1]) for lab in _LABELS],
            "Technical": [int(lab.split("_")[2]) for lab in _LABELS],
        }
    )
    return df, design


def ensure_maxquant_fixture(sf_dir: str) -> tuple[str, str, str]:
    """Idempotent: (proteinGroups.txt, design.csv, ratio_design.csv)
    paths for the scale factor, generating them on first use. A
    `_done` marker commits the trio atomically-enough for the
    single-machine bench (a crashed half-write regenerates)."""
    n = features_for_sf(sf_dir)
    d = os.path.join(
        "/tmp", f"padua_spark_pipebench_{_LAYOUT_TAG}", f"n{n}"
    )
    pg = os.path.join(d, "proteinGroups.txt")
    ds = os.path.join(d, "design.csv")
    rds = os.path.join(d, "ratio_design.csv")
    marker = os.path.join(d, "_done")
    if not os.path.exists(marker):
        os.makedirs(d, exist_ok=True)
        df, design = make_maxquant_tables(n)
        df.to_csv(pg, sep="\t", index=False)
        design.to_csv(ds, index=False)
        # SILAC entry point: one design row per ratio experiment
        pd.DataFrame(
            {"Label": ["E1", "E2", "E3"],
             "Group": ["Exp", "Exp", "Exp"],
             "Replicate": [1, 2, 3]}
        ).to_csv(rds, index=False)
        with open(marker, "w") as fh:
            fh.write(str(n))
    return pg, ds, rds


def make_msp_table(n_peptides: int, seed: int = 7) -> pd.DataFrame:
    """modificationSpecificPeptides-shaped frame for the §3.3 macro
    entry (reference analysis.py:263-287 ``enrichment_from_msp``):
    ``id``, semicolon-joined ``Modifications`` (2/5 of rows carry
    the phospho flag), and one ``Intensity <label>`` column per
    design label. Intensities are EXACT INTEGERS (< 2^31 each, group
    sums ≪ 2^53) so double summation is order-independent and the
    DuckDB oracle twin hash-matches bit-for-bit — the committed
    money/micro-unit rule for oracle-checked float sums."""
    rng = np.random.default_rng(seed)
    ids = np.arange(n_peptides)
    mods = np.select(
        [ids % 5 == 0, ids % 5 == 1, ids % 5 == 2],
        [
            "Phospho (STY)",
            "Oxidation (M)",
            "Phospho (STY);Oxidation (M)",
        ],
        default="Unmodified",
    )
    base = rng.normal(24.0, 2.0, size=n_peptides)
    noise = rng.normal(0.0, 0.5, size=(n_peptides, len(_LABELS)))
    inten = np.floor(
        np.power(2.0, np.clip(base[:, None] + noise, 4.0, 30.0))
    ).astype(np.int64)
    inten[rng.random(inten.shape) < 0.12] = 0
    df = pd.DataFrame({"id": ids, "Modifications": mods})
    for j, lab in enumerate(_LABELS):
        df[f"Intensity {lab}"] = inten[:, j]
    return df


def ensure_msp_fixture(sf_dir: str) -> tuple[str, str]:
    """Idempotent (msp.txt, design.csv) paths for the scale factor —
    shares the directory and design table with
    :func:`ensure_maxquant_fixture`, own ``_msp_done`` marker."""
    pg, ds, _ = ensure_maxquant_fixture(sf_dir)
    d = os.path.dirname(pg)
    msp = os.path.join(d, "msp.txt")
    marker = os.path.join(d, "_msp_done")
    if not os.path.exists(marker):
        n = features_for_sf(sf_dir)
        make_msp_table(n).to_csv(msp, sep="\t", index=False)
        with open(marker, "w") as fh:
            fh.write(str(n))
    return msp, ds
