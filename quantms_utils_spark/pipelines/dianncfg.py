"""dianncfg: SDRF enzyme/modification strings → DIA-NN config file.

Spark-first note: this tool is configuration-scale (a handful of strings), so
it is deliberately driver-side — the same site-merging aggregation is exposed
as a distributed operator in queries/core.py:group_concat_sites (SURVEY A9)
for when modification tables arrive as data instead of CLI flags.

Reference: quantmsutils/diann/dianncfg.py (enzyme map :174-194, site
rewriting :120-144, site merging :147-171, Met-loss special case :39-40).
The Unimod lookup (reference :20-36 via sdrf-pipelines) is environment-gated;
a small embedded dimension of common Unimod entries (public Unimod data)
backs it otherwise.
"""

from __future__ import annotations

import logging
import re
from pathlib import Path

logger = logging.getLogger(__name__)


class ConfigError(ValueError):
    """Unknown enzyme / unsupported modification (reference exits 1)."""


# Public Unimod entries (accession, monoisotopic delta mass) used by the
# quantms test matrix; the full database plugs in via sdrf-pipelines when
# present.
EMBEDDED_UNIMOD = {
    "Carbamidomethyl": ("UniMod:4", 57.021464),
    "Oxidation": ("UniMod:35", 15.994915),
    "Phospho": ("UniMod:21", 79.966331),
    "Acetyl": ("UniMod:1", 42.010565),
    "Met-loss": ("UniMod:765", -131.040485),
    "Methyl": ("UniMod:34", 14.01565),
    "Deamidated": ("UniMod:7", 0.984016),
}

MET_LOSS_MODIFICATION = "UniMod:765,-131.040485,*nM"

ENZYME_SPECIFICITY = {
    "Trypsin": "K*,R*,!*P",
    "Trypsin/P": "K*,R*",
    "Arg-C": "R*,!*P",
    "Asp-N": "*B,*D",
    "Chymotrypsin": "F*,W*,Y*,L*,!*P",
    "Lys-C": "K*,!*P",
}

_MULTIPLEX_MARKERS = ("TMT", "Label:", "iTRAQ", "mTRAQ", "Dimethyl:")


def _lookup_unimod(name: str) -> tuple[str, float] | None:
    try:  # pragma: no cover - environment-dependent
        from sdrf_pipelines.converters.openms.unimod import UnimodDatabase

        for m in UnimodDatabase().modifications:
            if m.get_name() == name:
                acc = m.get_accession().replace("UNIMOD:", "UniMod:")
                return acc, float(m._delta_mono_mass)
        return None
    except Exception:
        # Same gate policy as every other optional-dependency boundary in
        # the repo: a present-but-broken sdrf-pipelines install (missing
        # data file, API drift) must fall back to the embedded table, not
        # abort config generation.
        entry = EMBEDDED_UNIMOD.get(name)
        return (entry[0], entry[1]) if entry else None


def _map_site(site: str, mod_name: str, mod_type: str) -> str:
    """Site rewriting (reference :120-144): terminal keywords → DIA-NN site
    codes, compound sites only for the Met-loss carve-out."""
    if site == "Protein N-term":
        return "*n"
    if site == "N-term":
        return "n"
    if len(site.split(" ")) >= 2:
        prefix = " ".join(site.split(" ")[:-1])
        prefix = {"Protein N-term": "*n", "N-term": "n"}.get(prefix, prefix)
        compound = prefix + site.split(" ")[-1]
        if compound == "*nM" and mod_name == "Met-loss" and mod_type == "var_mod":
            return compound
        raise ConfigError(
            "Restricting to certain terminal AAs isn't directly supported by "
            "DIA-NN."
        )
    return site


def parse_modification(mod: str, mod_type: str) -> tuple[str, str]:
    """One SDRF mod string like ``"Oxidation (M)"`` → (``"UniMod:35,15.994915"``,
    site)."""
    name = mod.split(" ")[0]
    found = _lookup_unimod(name)
    if found is None:
        raise ConfigError(
            "Only Unimod modifications are currently supported for the DIA "
            f"pipeline. Unsupported modification: {mod}"
        )
    accession, delta = found
    if any(marker in name for marker in _MULTIPLEX_MARKERS):
        raise ConfigError(
            "quantms DIA-NN workflow only supports LFQ now! Unsupported "
            f"modifications: {mod}"
        )
    sites = re.findall(r"\((.*?)\)", " ".join(mod.split(" ")[1:]))
    if not sites:
        raise ConfigError(f"No site specification found in modification string: {mod}")
    site = _map_site(sites[0], name, mod_type)
    return f"{accession},{delta}", site


def merge_mod_sites(mods: str, mod_type: str) -> list[str]:
    """Group sites by modification, dedupe + sort + concat (reference
    :147-171 — the A9 aggregation, here over CLI-scale input)."""
    merged: dict[str, list[str]] = {}
    for mod in mods.split(","):
        accession, site = parse_modification(mod.strip(), mod_type)
        merged.setdefault(accession, []).append(site)
    return [
        f"{accession},{''.join(sorted(set(sites)))}"
        for accession, sites in merged.items()
    ]


def enzyme_cut(enzyme: str | None) -> str:
    if enzyme is None:
        logger.warning("No enzyme specified; DIA-NN will use its default cut rule.")
        return ""
    cut = ENZYME_SPECIFICITY.get(enzyme)
    if cut is None:
        raise ConfigError(
            f"Unknown enzyme '{enzyme}'. Supported enzymes: "
            f"{list(ENZYME_SPECIFICITY.keys())}"
        )
    return cut


def build_diann_config(
    enzyme: str | None, fix_mod: str | None, var_mod: str | None
) -> str:
    """Assemble the DIA-NN flag string (reference :59-76)."""
    cut = enzyme_cut(enzyme)
    parts = [f"--cut {cut}" if cut else ""]
    if fix_mod:
        for mod in merge_mod_sites(fix_mod, "fixed_mod"):
            parts.append(f" --fixed-mod {mod}")
    if var_mod:
        for mod in merge_mod_sites(var_mod, "var_mod"):
            if mod == MET_LOSS_MODIFICATION:
                parts.append(" --met-excision ")
            else:
                parts.append(f" --var-mod {mod}")
    return "".join(parts)


def write_diann_config(
    enzyme: str | None,
    fix_mod: str | None,
    var_mod: str | None,
    out_dir: str = ".",
) -> str:
    config = build_diann_config(enzyme, fix_mod, var_mod)
    target = Path(out_dir) / "diann_config.cfg"
    target.write_text(config)
    return str(target)
