"""Pure-Python peptidoform normalization — the pyopenms-free tier of the
AASequence round-trip the reference applies to DIA-NN modified sequences
(`/root/reference/quantmsutils/diann/diann2msstats.py:75-83`).

OpenMS's ``AASequence.fromString(s).toString()`` round-trip has two visible
effects on DIA-NN ``Modified.Sequence`` values (documented public behavior of
the OpenMS string grammar):

1. Unimod accessions are resolved to the modification's canonical (Unimod
   title / PSI-MS) name: ``C(UniMod:4)`` → ``C(Carbamidomethyl)``.
2. A modification group *before the first residue* is an N-terminal
   modification and is rendered with the leading-dot notation:
   ``(UniMod:1)MKV`` → ``.(Acetyl)MKV``.

This module reproduces exactly those rewrites for the Unimod accessions that
cover standard proteomics workflows (fixed/variable mods, labeling reagents,
termini artifacts). Accessions outside the table pass through unchanged —
best-effort, never lossy. The full pyopenms path takes precedence when the
library is importable.
"""

from __future__ import annotations

import re

# Unimod accession → canonical title (public Unimod database entries; the
# subset DIA-NN / quantms workflows emit in practice).
UNIMOD_NAMES: dict[int, str] = {
    1: "Acetyl",
    2: "Amidated",
    4: "Carbamidomethyl",
    5: "Carbamyl",
    7: "Deamidated",
    21: "Phospho",
    26: "Pyro-carbamidomethyl",
    27: "Glu->pyro-Glu",
    28: "Gln->pyro-Glu",
    34: "Methyl",
    35: "Oxidation",
    36: "Dimethyl",
    37: "Trimethyl",
    39: "Methylthio",
    121: "GG",
    188: "Label:13C(6)",
    199: "Dimethyl:2H(4)",
    259: "Label:13C(6)15N(2)",
    267: "Label:13C(6)15N(4)",
    425: "Dioxidation",
    730: "iTRAQ8plex",
    737: "TMT6plex",
    765: "Met-loss",
    766: "Met-loss+Acetyl",
    2016: "TMTpro",
}

_MOD_GROUP = re.compile(r"\((UniMod:(\d+))\)", re.IGNORECASE)
_LEADING_MOD = re.compile(r"^\((?:UniMod:\d+|[A-Za-z][^)]*)\)", re.IGNORECASE)


def _resolve(m: re.Match) -> str:
    name = UNIMOD_NAMES.get(int(m.group(2)))
    return f"({name})" if name is not None else m.group(0)


def normalize_peptidoform(seq: str | None) -> str | None:
    """Normalize one DIA-NN peptidoform string (see module docstring).

    Mirrors the reference's ``^``-prefix handling: a caret marker is held
    aside, the remainder normalized, and the caret re-attached.
    """
    if seq is None:
        return None
    caret = seq.startswith("^") or "^" in seq
    s = seq.replace("^", "") if caret else seq
    # N-terminal group → leading-dot notation (only if not already dotted)
    if not s.startswith(".") and _LEADING_MOD.match(s):
        s = "." + s
    s = _MOD_GROUP.sub(_resolve, s)
    return ("^" + s) if caret else s
