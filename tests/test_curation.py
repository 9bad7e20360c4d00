"""Offline curation: synthetic raw sources through the full pipeline."""

import json
import os

import pandas as pd
import pytest

pytestmark = pytest.mark.quick

from controlled_peptide_generation_tpu.data import curation


def make_card(seq, n_term="#", c_term="#", activities=(), toxics=(),
              unusual=None):
    card = {
        "seq": seq, "nTerminus": n_term, "cTerminus": c_term,
        "targetActivities": [
            {"unit": "µM", "concentration": c} for c in activities],
        "hemoliticCytotoxicActivities": [
            {"unit": "µM", "concentration": c} for c in toxics],
    }
    if unusual:
        card["unusualAminoAcids"] = unusual
    return {"peptideCard": card}


@pytest.fixture()
def raw_dir(tmp_path):
    raw = tmp_path / "raw"
    (raw / "dbaasp").mkdir(parents=True)
    cards = {
        # strong AMP: tiny concentrations -> converted < 25 -> amp_posc
        "1.json": make_card("KKLLKKLLKK", activities=["0.5", "1.0"]),
        # inactive: huge concentrations -> all > 100 -> amp_negc
        "2.json": make_card("AAAGGGAAAG", activities=["500", ">800"]),
        # toxic: all cytotox < 200 -> tox_posc
        "3.json": make_card("WWCCWWCCWW", toxics=["0.1"]),
        # nontoxic: all cytotox > 250 -> tox_negc
        "4.json": make_card("GGGSSSGGGS", toxics=["900"]),
        # filtered: amidated C terminus
        "5.json": make_card("KLKLKLKLKL", c_term="AMD",
                            activities=["0.1"]),
        # filtered: unusual amino acids
        "6.json": make_card("RRRRRRRRRR", activities=["0.1"],
                            unusual="Orn"),
        # filtered: contains X
        "7.json": make_card("KKXKK", activities=["0.1"]),
    }
    for name, card in cards.items():
        with open(raw / "dbaasp" / name, "w") as fh:
            json.dump(card, fh)

    (raw / "satpdb").mkdir()
    pd.DataFrame({
        "Sequence": ["MMFFMMFFMM", "RRWWRRWWRR", "QQ-QQ"],
        "C.terminal.modification": ["Free", "Free", "Free"],
        "N.terminal.modification": ["Free", "Free", "Free"],
        "Peptide.Type": ["Linear", "Linear", "Linear"],
        "Type.of.Modification": ["None", "None", "None"],
        "Major.Functions": ["antimicrobial", "toxic", "NA"],
        "Sub.functions": ["NA", "NA", "NA"],
    }).to_csv(raw / "satpdb" / "satpdb.csv", index=False)

    (raw / "ampep").mkdir()
    with open(raw / "ampep" / "pos_ampep_l1-80.csv", "w") as fh:
        fh.write("F F K K F F K K F F ,1\n")
    with open(raw / "ampep" / "neg_ampep_l1-80.csv", "w") as fh:
        fh.write("D D E E D D E E D D ,1\n")

    (raw / "uniprot").mkdir()
    with open(raw / "uniprot" / "uniprot_reviewed_yes_l1-80.txt", "w") as f:
        f.write("MATLPPTANP\nMISDEQLNSL\n")
    with open(raw / "uniprot" / "uniprot_reviewed_no_l1-80.txt", "w") as f:
        f.write("MATLPPTANP\n")  # duplicate on purpose

    (raw / "toxicity").mkdir()
    with open(raw / "toxicity" / "nontoxic_trembl_toxinnpred.txt", "w") as f:
        f.write("HHHHSSSSHH\n")
    with open(raw / "toxicity" / "nontoxic_swissprot_toxinnpred.txt",
              "w") as f:
        f.write("TTTTNNNNTT\n")
    return str(raw)


def test_unit_parsing():
    assert curation.parse_concentration(">10") == 10
    assert curation.parse_concentration("<1.25") == 1.25
    assert curation.parse_concentration("=2") == 2
    assert curation.parse_concentration("10.7±4.6") == 10.7
    assert curation.parse_concentration("12.5-25.0") == 12.5
    assert curation.parse_concentration("NA") is None
    assert curation.parse_concentration("junk") is None


def test_molecular_weight():
    # glycine dipeptide GG: 2*57.0519 + water - amide delta
    mw = curation.molecular_weight("GG", amide=False)
    assert abs(mw - (2 * 57.0519 + 18.01524)) < 1e-3
    assert curation.molecular_weight("GX") is None


def test_curate_end_to_end(raw_dir, tmp_path):
    out = str(tmp_path / "out")
    counts = curation.curate(raw_dir, out)
    amp = pd.read_csv(os.path.join(out, "amp_lab.csv"))
    tox = pd.read_csv(os.path.join(out, "tox_lab.csv"))
    unlab = pd.read_csv(os.path.join(out, "unlab.csv"))

    amp_by_seq = {r.text.replace(" ", ""): r.amp for r in amp.itertuples()}
    # dbaasp strong activity -> amp_posc (0.5 µM * MW/1000 << 25 µg/ml)
    assert amp_by_seq["KKLLKKLLKK"] == "amp_posc"
    # dbaasp all-inactive -> amp_negc
    assert amp_by_seq["AAAGGGAAAG"] == "amp_negc"
    # ampep sources -> *nc labels
    assert amp_by_seq["FFKKFFKKFF"] == "amp_posnc"
    assert amp_by_seq["DDEEDDEEDD"] == "amp_negnc"
    # satpdb valid rows become positives; '-'-containing row filtered
    assert amp_by_seq["MMFFMMFFMM"] == "amp_posnc"
    assert "QQ-QQ" not in {t.replace(" ", "") for t in amp.text}
    # filtered dbaasp cards must not appear anywhere
    all_seqs = {t.replace(" ", "") for t in unlab.text}
    assert "KLKLKLKLKL" not in all_seqs
    assert "RRRRRRRRRR" not in all_seqs
    assert "KKXKK" not in all_seqs

    tox_by_seq = {r.text.replace(" ", ""): r.tox for r in tox.itertuples()}
    assert tox_by_seq["WWCCWWCCWW"] == "tox_posc"
    assert tox_by_seq["GGGSSSGGGS"] == "tox_negc"
    assert tox_by_seq["RRWWRRWWRR"] == "tox_posnc"   # satpdb 'toxic'
    assert tox_by_seq["HHHHSSSSHH"] == "tox_negnc"

    # unlabeled merges uniprot + labeled, deduped, space-separated
    assert counts["unlab"] == len(unlab)
    assert "M A T L P P T A N P" in set(unlab.text)
    assert unlab.text.duplicated().sum() == 0

    # loader can consume the curated corpus directly
    from controlled_peptide_generation_tpu.data import AttributeDataLoader
    from controlled_peptide_generation_tpu import config as C
    loader = AttributeDataLoader(
        mbsize=4, max_seq_len=25, data_path=out,
        csv_files=["unlab.csv", "amp_lab.csv", "tox_lab.csv"],
        attributes=C.AMP_ATTRIBUTES[:2],
        iteratorspecs={"train_vae": {"subset": ["split=train"],
                                     "weighted_random_sample": True}},
        split_seed=1)
    b = loader.next_batch("train_vae")
    assert b.text.shape == (4, 25)


REF_RAW = "/root/reference/data_processing/data"


@pytest.mark.skipif(not os.path.isdir(REF_RAW),
                    reason="reference raw data not mounted")
def test_curation_on_reference_bundled_raw_data(tmp_path):
    """End-to-end curation over the reference repo's own bundled raw
    sources (its de-facto fixtures, README.md:31) and a loader round-trip
    over the curated corpus."""
    out = str(tmp_path / "amp")
    curation.curate(REF_RAW, out)

    unlab = pd.read_csv(os.path.join(out, "unlab.csv"))
    amp = pd.read_csv(os.path.join(out, "amp_lab.csv"))
    tox = pd.read_csv(os.path.join(out, "tox_lab.csv"))
    assert len(unlab) > 100 and len(amp) > 10 and len(tox) > 10

    # the FULL 7-file contract (config.AMP_CSV_FILES / reference
    # cfg.py:340-341) is always written: satpdb-function-derived corpora
    # with their single-value attribute columns, and a header-only
    # sol_lab.csv when the solubility raws are absent from the bundle
    for name, col, values in (("anticancer.csv", "anticancer",
                               {"anticancer"}),
                              ("antihypertensive.csv", "antihyper",
                               {"antihyper"}),
                              ("cell-cell.csv", "hormone", {"cell"}),
                              ("sol_lab.csv", "sol", set())):
        df = pd.read_csv(os.path.join(out, name))
        assert list(df.columns) == ["text", col], name
        assert set(df[col]) <= values or values == set(), name
    assert len(pd.read_csv(os.path.join(out, "anticancer.csv"))) >= 1
    assert len(pd.read_csv(os.path.join(out, "antihypertensive.csv"))) >= 1
    assert set(amp.columns) >= {"text", "amp"}
    assert set(tox.columns) >= {"text", "tox"}
    # label values must be exactly the loader's attribute-map keys
    # (cfg.py:316-321 amp_* / tox_* vocabulary)
    assert set(amp["amp"]) <= {"amp_posc", "amp_posnc", "amp_negc",
                               "amp_negnc"}
    assert set(tox["tox"]) <= {"tox_posc", "tox_posnc", "tox_negc",
                               "tox_negnc"}
    # validity filters: canonical AAs only, length bounds
    aas = set("ACDEFGHIKLMNPQRSTVWY")
    for df in (unlab, amp, tox):
        seqs = df["text"].str.replace(" ", "")
        assert seqs.map(lambda s: set(s) <= aas).all()
        assert (seqs.str.len() <= 50).all()

    # loader round-trip on the curated corpus
    from controlled_peptide_generation_tpu import config as C
    from controlled_peptide_generation_tpu.data.loader import (
        AttributeDataLoader)
    cfg = C.default_config()
    spec = C.dataset_spec(cfg)          # default dataset = 'amp'
    spec["data_path"] = out
    spec["fixed_vocab_path"] = ""   # build vocab from the curated corpus
    # the bundled fixtures cover the three core corpora only (the other
    # csvs come from the reference's separate full-data download)
    spec["csv_files"] = ["unlab.csv", "amp_lab.csv", "tox_lab.csv"]
    spec["attributes"] = [a for a in spec["attributes"]
                          if a[0] in ("amp", "tox")]
    present = ({f"amp={v}" for v in set(amp["amp"])}
               | {f"tox={v}" for v in set(tox["tox"])})
    for it in spec["iteratorspecs"].values():
        if "sample_prob_factors" in it:
            it["sample_prob_factors"] = {
                k: v for k, v in it["sample_prob_factors"].items()
                if k in present}
    loader = AttributeDataLoader(mbsize=8, max_seq_len=cfg.max_seq_len,
                                 **spec)
    b = loader.next_batch("train_vae")
    assert b.text.shape == (8, loader.tokens.shape[1])
    assert hasattr(b, "amp") and hasattr(b, "tox")
