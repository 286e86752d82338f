"""Producer-independent parity for the idXML → identifications pipeline.

Same rationale as tests/test_independent_parity.py (mzML): pyopenms-built
goldens are impossible in this environment, so circularity is broken with a
SECOND implementation of the PUBLIC idXML format
(https://www.openms.de/xml-schema/IdXML_1_5.xsd) that shares no code or
parsing strategy with the engine's parser:

- engine (`sources/idxml.py:_parse_xml_idxml`): ElementTree DOM tree,
  `.iter()` traversal, dict lookups.
- here: event-driven `xml.parsers.expat` SAX callbacks building rows as the
  byte stream arrives — no tree ever exists, attribute handling, text
  accumulation and scoping all re-derived from the format description.

Field semantics (engine list from ConsensusID ``SE:*`` search params, run
stem from spectra_data, ranks as best-first file order, target/decoy flag,
MS:1001491 / q-value fallback, evidence position lists) are re-read from the
public format and the reference's documented behavior
(/root/reference/quantmsutils/psm/psm_conversion.py:87-108), not from the
engine source. Agreement on the committed fixture is evidence about the
format, not about shared quirks.
"""

from __future__ import annotations

import math
import xml.parsers.expat
from pathlib import Path

import pytest

FIXTURE = Path(__file__).parent / "fixtures" / "tiny.idXML"


class _SaxIdXML:
    """Event-driven idXML interpreter (expat)."""

    def __init__(self) -> None:
        self.search_params: dict[str, set[str]] = {}
        self.rows: list[dict] = []
        # parser scope state
        self._sp_id: str | None = None
        self._run_engine = ""
        self._run_ref = ""
        self._in_protein_id = False
        self._accessions: dict[str, str] = {}
        self._spectra_data: str | None = None
        self._pid: dict | None = None
        self._hit: dict | None = None

    def start(self, name: str, a: dict) -> None:
        if name == "SearchParameters":
            self._sp_id = a.get("id", "")
            self.search_params[self._sp_id] = set()
        elif name == "UserParam":
            pname, val = a.get("name", ""), a.get("value")
            if self._sp_id is not None:
                self.search_params[self._sp_id].add(pname)
            elif self._hit is not None:
                self._hit["meta"][pname] = val
            elif self._in_protein_id and pname == "spectra_data":
                self._spectra_data = (
                    (val or "").strip("[]").split(",")[0].strip()
                )
        elif name == "IdentificationRun":
            self._run_engine = a.get("search_engine", "")
            self._run_ref = a.get("search_parameters_ref", "")
            self._accessions = {}
            self._spectra_data = None
        elif name == "ProteinIdentification":
            self._in_protein_id = True
        elif name == "ProteinHit":
            self._accessions[a.get("id", "")] = a.get("accession", "")
        elif name == "PeptideIdentification":
            self._pid = {
                "spectrum_ref": a.get("spectrum_reference"),
                "rt": float(a.get("RT", "nan")),
                "mz": float(a.get("MZ", "nan")),
                "score_type": a.get("score_type"),
                "hits": [],
            }
        elif name == "PeptideHit":
            self._hit = {"attrs": a, "meta": {}}

    def end(self, name: str) -> None:
        if name == "SearchParameters":
            self._sp_id = None
        elif name == "ProteinIdentification":
            self._in_protein_id = False
        elif name == "PeptideHit":
            assert self._pid is not None and self._hit is not None
            a, meta = self._hit["attrs"], self._hit["meta"]
            q = meta.get("MS:1001491", meta.get("q-value"))
            pep = meta.get("Posterior Error Probability_score")
            sup = meta.get("consensus_support")
            self._pid["hits"].append(
                {
                    "peptidoform": a.get("sequence"),
                    "charge": int(a.get("charge", "0")),
                    "score": float(a.get("score", "nan")),
                    "is_decoy": 0 if meta.get("target_decoy") == "target" else 1,
                    "hit_rank": len(self._pid["hits"]) + 1,
                    "consensus_support": None if sup is None else float(sup),
                    "qvalue_meta": None if q is None else float(q),
                    "posterior_error_probability": None if pep is None else float(pep),
                    "protein_accessions": [
                        self._accessions.get(r, r)
                        for r in (a.get("protein_refs") or "").split()
                    ],
                    "protein_start_positions": [
                        int(v) for v in (a.get("start") or "").split()
                    ],
                    "protein_end_positions": [
                        int(v) for v in (a.get("end") or "").split()
                    ],
                }
            )
            self._hit = None
        elif name == "PeptideIdentification":
            assert self._pid is not None
            pid = self._pid
            self._pid = None
            if "ConsensusID" in self._run_engine:
                keys = self.search_params.get(self._run_ref, set())
                engines = [
                    e
                    for e, k in (
                        ("MS-GF+", "SE:MS-GF+"),
                        ("Comet", "SE:Comet"),
                        ("Sage", "SE:Sage"),
                    )
                    if k in keys
                ]
            else:
                engines = [self._run_engine]
            assert self._spectra_data, "spectra_data must precede peptides"
            stem = self._spectra_data.rsplit("/", 1)[-1].split(".")[0]
            self.rows.append(
                {
                    "reference_file_name": stem,
                    "spectrum_ref": pid["spectrum_ref"],
                    "rt": pid["rt"],
                    "mz": pid["mz"],
                    "engines": engines,
                    "score_type": pid["score_type"],
                    "hits": pid["hits"],
                }
            )


def _sax_parse(path: Path) -> list[dict]:
    h = _SaxIdXML()
    p = xml.parsers.expat.ParserCreate()
    p.StartElementHandler = h.start
    p.EndElementHandler = h.end
    p.ParseFile(path.open("rb"))
    return h.rows


def _close(a, b, tol=1e-9):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and math.isnan(a):
        return isinstance(b, float) and math.isnan(b)
    return abs(a - b) <= tol


@pytest.mark.skipif(not FIXTURE.exists(), reason="fixture missing")
def test_engine_idxml_matches_sax_interpreter(spark):
    from quantms_utils_spark.sources.idxml import read_identifications

    engine = (
        read_identifications(spark, [str(FIXTURE)], parser="xml")
        .orderBy("spectrum_reference")
        .collect()
    )
    indep = sorted(_sax_parse(FIXTURE), key=lambda r: r["spectrum_ref"])
    assert len(engine) == len(indep) > 0
    for er, ir in zip(engine, indep):
        assert er["reference_file_name"] == ir["reference_file_name"]
        assert er["spectrum_reference"] == ir["spectrum_ref"]
        assert _close(er["retention_time"], ir["rt"])
        assert _close(er["exp_mass_to_charge"], ir["mz"])
        assert list(er["search_engines"]) == ir["engines"]
        assert er["score_type"] == ir["score_type"]
        assert len(er["hits"]) == len(ir["hits"])
        for eh, ih in zip(er["hits"], ir["hits"]):
            for k in (
                "peptidoform", "charge", "is_decoy", "hit_rank",
                "protein_accessions", "protein_start_positions",
                "protein_end_positions",
            ):
                ev = eh[k]
                ev = list(ev) if k.startswith("protein_") else ev
                assert ev == ih[k], (k, ev, ih[k])
            for k in (
                "score", "consensus_support", "qvalue_meta",
                "posterior_error_probability",
            ):
                assert _close(eh[k], ih[k]), (k, eh[k], ih[k])


RICH_IDXML = """<?xml version="1.0" encoding="UTF-8"?>
<IdXML version="1.5">
<SearchParameters id="SP_0" db="db.fasta" mass_type="monoisotopic" enzyme="trypsin" missed_cleavages="1" precursor_peak_tolerance="10" peak_mass_tolerance="0.02">
\t<UserParam type="string" name="SE:Sage" value=""/>
\t<UserParam type="string" name="Sage:db" value="db.fasta"/>
</SearchParameters>
<SearchParameters id="SP_1" db="db2.fasta" mass_type="monoisotopic" enzyme="trypsin" missed_cleavages="0" precursor_peak_tolerance="5" peak_mass_tolerance="0.01"/>
<IdentificationRun date="2024-02-02T09:00:00" search_engine="ConsensusID" search_engine_version="3.1" search_parameters_ref="SP_0">
\t<ProteinIdentification score_type="" higher_score_better="true" significance_threshold="0">
\t\t<ProteinHit id="PH_0" accession="Q00001" score="0.0" sequence=""/>
\t\t<ProteinHit id="PH_1" accession="Q00002" score="0.0" sequence=""/>
\t\t<ProteinHit id="PH_2" accession="Q00003" score="0.0" sequence=""/>
\t\t<UserParam type="stringList" name="spectra_data" value="[/lake/runs/runA.mzML.gz, /lake/runs/other.mzML]"/>
\t</ProteinIdentification>
\t<PeptideIdentification score_type="q-value" higher_score_better="false" significance_threshold="0" MZ="512.75" RT="120.5" spectrum_reference="controllerType=0 controllerNumber=1 scan=900">
\t\t<PeptideHit score="0.0005" sequence="ACDEFGHIK" charge="3" start="5 90" end="13 98" protein_refs="PH_0 PH_2">
\t\t\t<UserParam type="string" name="target_decoy" value="target"/>
\t\t\t<UserParam type="float" name="q-value" value="0.0005"/>
\t\t\t<UserParam type="float" name="Posterior Error Probability_score" value="0.01"/>
\t\t</PeptideHit>
\t\t<PeptideHit score="0.4" sequence="LM(Oxidation)NPQR" charge="2" start="44" end="49" protein_refs="PH_1">
\t\t\t<UserParam type="string" name="target_decoy" value="decoy"/>
\t\t\t<UserParam type="float" name="MS:1001491" value="0.4"/>
\t\t\t<UserParam type="float" name="consensus_support" value="0.5"/>
\t\t</PeptideHit>
\t\t<PeptideHit score="0.9" sequence="STVWY" charge="1">
\t\t\t<UserParam type="string" name="target_decoy" value="decoy"/>
\t\t</PeptideHit>
\t</PeptideIdentification>
\t<PeptideIdentification score_type="q-value" higher_score_better="false" significance_threshold="0" MZ="300.25" RT="60.25" spectrum_reference="controllerType=0 controllerNumber=1 scan=901">
\t\t<PeptideHit score="0.02" sequence="GGGKK" charge="2" start="1" end="5" protein_refs="PH_1">
\t\t\t<UserParam type="string" name="target_decoy" value="target"/>
\t\t\t<UserParam type="float" name="consensus_support" value="0.88"/>
\t\t</PeptideHit>
\t</PeptideIdentification>
</IdentificationRun>
<IdentificationRun date="2024-02-02T10:00:00" search_engine="Comet" search_engine_version="2024.01" search_parameters_ref="SP_1">
\t<ProteinIdentification score_type="" higher_score_better="true" significance_threshold="0">
\t\t<ProteinHit id="PH_0" accession="Z99999" score="0.0" sequence=""/>
\t\t<UserParam type="stringList" name="spectra_data" value="[relative/runB.mzML]"/>
\t</ProteinIdentification>
\t<PeptideIdentification score_type="expect" higher_score_better="false" significance_threshold="0" MZ="420.5" RT="33.0" spectrum_reference="controllerType=0 controllerNumber=1 scan=77">
\t\t<PeptideHit score="1.5" sequence="HHHH" charge="2" start="7" end="10" protein_refs="PH_0">
\t\t\t<UserParam type="string" name="target_decoy" value="target"/>
\t\t</PeptideHit>
\t</PeptideIdentification>
</IdentificationRun>
</IdXML>
"""


def test_rich_document_edge_cases_agree(spark, tmp_path):
    """Multi-run document: ConsensusID run with a Sage-only engine list,
    a plain Comet run (engine list = [engine]), q-value fallback name vs
    MS:1001491, a hit with NO protein evidence, missing consensus_support
    / PEP, double extension (.mzML.gz) stem, multi-entry spectra_data
    (first wins) — engine and SAX interpreter must agree on every field."""
    from quantms_utils_spark.sources.idxml import read_identifications

    p = tmp_path / "rich.idXML"
    p.write_text(RICH_IDXML)
    engine = (
        read_identifications(spark, [str(p)], parser="xml")
        .orderBy("reference_file_name", "spectrum_reference")
        .collect()
    )
    indep = sorted(
        _sax_parse(p), key=lambda r: (r["reference_file_name"], r["spectrum_ref"])
    )
    assert len(engine) == len(indep) == 3
    stems = {r["reference_file_name"] for r in indep}
    assert stems == {"runA", "runB"}
    for er, ir in zip(engine, indep):
        assert er["reference_file_name"] == ir["reference_file_name"]
        assert er["spectrum_reference"] == ir["spectrum_ref"]
        assert _close(er["retention_time"], ir["rt"])
        assert _close(er["exp_mass_to_charge"], ir["mz"])
        assert list(er["search_engines"]) == ir["engines"]
        assert er["score_type"] == ir["score_type"]
        assert len(er["hits"]) == len(ir["hits"])
        for eh, ih in zip(er["hits"], ir["hits"]):
            for k in (
                "peptidoform", "charge", "is_decoy", "hit_rank",
                "protein_accessions", "protein_start_positions",
                "protein_end_positions",
            ):
                ev = eh[k]
                ev = list(ev) if k.startswith("protein_") else ev
                assert ev == ih[k], (k, ev, ih[k])
            for k in (
                "score", "consensus_support", "qvalue_meta",
                "posterior_error_probability",
            ):
                assert _close(eh[k], ih[k]), (k, eh[k], ih[k])
