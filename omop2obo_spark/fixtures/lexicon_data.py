"""Literal, deterministic mini-ontology + UMLS fixture data.

Shape mirrors the reference's pickled lexicon
(/root/reference/omop2obo/ontology_explorer.py:43-72: per-ontology dicts
label/definition/synonym/dbxref, each ``lowercased string -> class URI``,
with parallel ``*_type`` dicts) and its fake UMLS files
(/root/reference/tests/data/mappings/MRCONSO_FAKE.RRF shape,
clinical_concept_annotator.py:158-185). Values are public HP/MONDO-style
terms; a few match the reference's own test constants
(tests/test_data_utils.py:88-93) so parity goldens carry over.

Everything here is a Python literal — no RNG — so fixtures are stable
across runs and processes.
"""

OBO = "http://purl.obolibrary.org/obo/"

# ont, short_id, label, definition, [(synonym, type)], [(dbxref, type)], [ancestor short_ids]
CONCEPTS = [
    ("hp", "HP_0008181", "abetalipoproteinemia",
     "inability to synthesize apolipoprotein b",
     [("abetalipoproteinemia neuropathy", "hasExactSynonym")],
     [("SNOMEDCT_US:190787008", "DbXref"), ("UMLS:C0000744", "DbXref")],
     ["HP_0003119"]),
    ("hp", "HP_0100598", "pulmonary edema",
     "accumulation of fluid in the lung",
     [("wet lung", "hasExactSynonym"), ("fluid on lungs", "hasRelatedSynonym")],
     [("SNOMEDCT_US:19242006", "DbXref"), ("UMLS:C0034063", "DbXref")],
     ["HP_0002088"]),
    ("hp", "HP_0012384", "rhinorrhea",
     "excessive mucous secretion from the nose",
     [("runny nose", "hasExactSynonym")],
     [("SNOMEDCT_US:64531003", "DbXref"), ("UMLS:C1260880", "DbXref")],
     ["HP_0000366"]),
    ("hp", "HP_0002617", "dilatation",
     "abnormal enlargement of a vessel",
     [("aneurysm", "hasExactSynonym"), ("vascular dilatation", "hasRelatedSynonym")],
     [("SNOMEDCT_US:25362006", "DbXref"), ("UMLS:C0002940", "DbXref")],
     ["HP_0011004"]),
    ("hp", "HP_0012531", "pain",
     "unpleasant sensory and emotional experience",
     [("painful sensation", "hasExactSynonym")],
     [("SNOMEDCT_US:22253000", "DbXref"), ("UMLS:C0030193", "DbXref")],
     ["HP_0025142"]),
    ("hp", "HP_0001945", "fever",
     "elevated body temperature",
     [("pyrexia", "hasExactSynonym"), ("hyperthermia episode", "hasRelatedSynonym")],
     [("SNOMEDCT_US:386661006", "DbXref"), ("UMLS:C0015967", "DbXref")],
     ["HP_0004370"]),
    ("hp", "HP_0002315", "headache",
     "cephalgia or pain in the head",
     [("cephalgia", "hasExactSynonym"), ("head pain", "hasExactSynonym")],
     [("SNOMEDCT_US:25064002", "DbXref"), ("UMLS:C0018681", "DbXref")],
     ["HP_0012531"]),
    ("hp", "HP_0002018", "nausea",
     "a sensation of unease in the stomach",
     [("feeling queasy", "hasRelatedSynonym")],
     [("SNOMEDCT_US:422587007", "DbXref"), ("UMLS:C0027497", "DbXref")],
     ["HP_0002017"]),
    ("hp", "HP_0003119", "abnormal circulating lipid concentration",
     "deviation from normal lipid levels",
     [("lipid abnormality", "hasExactSynonym")],
     [("UMLS:C0428462", "DbXref")],
     []),
    ("hp", "HP_0002088", "abnormal lung morphology",
     "structural anomaly of the lung",
     [("abnormally shaped lung", "hasExactSynonym")],
     [("UMLS:C4025761", "DbXref")],
     []),
    ("hp", "HP_0000366", "abnormality of the nose",
     "structural anomaly of the nose",
     [("nasal anomaly", "hasExactSynonym")],
     [("UMLS:C0240547", "DbXref")],
     []),
    ("hp", "HP_0011004", "abnormal systemic arterial morphology",
     "structural anomaly of arteries",
     [("arterial anomaly", "hasRelatedSynonym")],
     [("UMLS:C4023165", "DbXref")],
     []),
    ("hp", "HP_0025142", "constitutional symptom",
     "symptom affecting the whole body",
     [],
     [("UMLS:C0009812", "DbXref")],
     []),
    ("hp", "HP_0004370", "abnormality of temperature regulation",
     "deviation in thermoregulation",
     [("temperature dysregulation", "hasExactSynonym")],
     [("UMLS:C4025655", "DbXref")],
     []),
    ("hp", "HP_0002017", "nausea and vomiting",
     "co-occurrence of nausea and vomiting",
     [],
     [("SNOMEDCT_US:16932000", "DbXref"), ("UMLS:C0027498", "DbXref")],
     []),
    ("hp", "HP_0100309", "subdural hemorrhage",
     "bleeding between the dura and the brain",
     [("subdural bleeding", "hasExactSynonym")],
     [("SNOMEDCT_US:95453001", "DbXref"), ("UMLS:C0018946", "DbXref")],
     ["HP_0002315"]),
    ("hp", "HP_0100310", "epidural hemorrhage",
     "bleeding between the dura and the skull",
     [("extradural hematoma", "hasExactSynonym")],
     [("SNOMEDCT_US:62564004", "DbXref"), ("UMLS:C0238154", "DbXref")],
     ["HP_0002315"]),
    ("hp", "HP_0002960", "autoimmunity",
     "immune response against own cells",
     [("autoimmune disease tendency", "hasRelatedSynonym")],
     [("SNOMEDCT_US:85828009", "DbXref"), ("UMLS:C0004364", "DbXref")],
     []),
    ("mondo", "MONDO_0005737", "ebola hemorrhagic fever",
     "viral hemorrhagic fever caused by ebolavirus",
     [("ebola virus disease", "hasExactSynonym"), ("evd", "hasRelatedSynonym")],
     [("DOID:4325", "DbXref"), ("UMLS:C0282687", "DbXref")],
     ["MONDO_0005762"]),
    ("mondo", "MONDO_0001673", "myocarditis",
     "inflammation of the myocardium",
     [("inflammatory cardiomyopathy", "hasRelatedSynonym")],
     [("SNOMEDCT_US:50920009", "DbXref"), ("UMLS:C0027059", "DbXref")],
     ["MONDO_0005267"]),
    ("mondo", "MONDO_0004609", "infective myocarditis",
     "myocarditis due to infectious agent",
     [("myocarditis due to infectious agent", "hasExactSynonym")],
     [("SNOMEDCT_US:22653005", "DbXref"), ("UMLS:C0729608", "DbXref")],
     ["MONDO_0001673"]),
    ("mondo", "MONDO_0001703", "color vision disorder",
     "anomaly of color perception",
     [("color blindness", "hasExactSynonym")],
     [("SNOMEDCT_US:70173007", "DbXref"), ("UMLS:C0242225", "DbXref")],
     ["MONDO_0005328"]),
    ("mondo", "MONDO_0001273", "megacolon",
     "abnormal dilation of the colon",
     [("dilatation of colon", "hasExactSynonym")],
     [("SNOMEDCT_US:28536002", "DbXref"), ("UMLS:C0025160", "DbXref")],
     ["MONDO_0021063"]),
    ("mondo", "MONDO_0002050", "eczema",
     "inflammatory skin condition",
     [("dermatitis eczematous", "hasExactSynonym"), ("atopic rash", "hasRelatedSynonym")],
     [("SNOMEDCT_US:43116000", "DbXref"), ("UMLS:C0013595", "DbXref")],
     ["MONDO_0005093"]),
    ("mondo", "MONDO_0005762", "viral hemorrhagic fever",
     "severe multisystem syndrome caused by viruses",
     [],
     [("UMLS:C0019104", "DbXref")],
     []),
    ("mondo", "MONDO_0005267", "heart disorder",
     "disease of the heart",
     [("cardiac disorder", "hasExactSynonym")],
     [("SNOMEDCT_US:56265001", "DbXref"), ("UMLS:C0018799", "DbXref")],
     []),
    ("mondo", "MONDO_0005328", "eye disorder",
     "disease of the eye",
     [("ophthalmic disorder", "hasRelatedSynonym")],
     [("UMLS:C0015397", "DbXref")],
     []),
    ("mondo", "MONDO_0021063", "colon disorder",
     "disease of the colon",
     [],
     [("UMLS:C0009373", "DbXref")],
     []),
    ("mondo", "MONDO_0005093", "skin disorder",
     "disease of the skin",
     [("cutaneous disorder", "hasExactSynonym")],
     [("SNOMEDCT_US:95320005", "DbXref"), ("UMLS:C0037274", "DbXref")],
     []),
]

# UMLS MRCONSO fixture rows: (CUI, LANG, SAB, CODE). Includes non-ENG and
# NOCODE rows (must be filtered out, clinical_concept_annotator.py:163), an
# HPO/MONDO SAB block whose CODEs are OBO ids (drives the ananke CUI bridge,
# data_utils.py:305-348), and shared CUIs across SABs (drives the
# double-merge expansion, clinical_concept_annotator.py:212-219).
MRCONSO_ROWS = [
    ("C0000744", "ENG", "SNOMEDCT_US", "190787008"),
    ("C0000744", "ENG", "MSH", "D000012"),
    ("C0000744", "ENG", "HPO", "HP:0008181"),
    ("C0000744", "FRE", "MSHFRE", "D000012"),
    ("C0034063", "ENG", "SNOMEDCT_US", "19242006"),
    ("C0034063", "ENG", "HPO", "HP:0100598"),
    ("C0034063", "ENG", "ICD10CM", "J81.1"),
    ("C1260880", "ENG", "SNOMEDCT_US", "64531003"),
    ("C1260880", "ENG", "HPO", "HP:0012384"),
    ("C0015967", "ENG", "SNOMEDCT_US", "386661006"),
    ("C0015967", "ENG", "HPO", "HP:0001945"),
    ("C0015967", "ENG", "ICD10CM", "R50.9"),
    ("C0015967", "SPA", "MSHSPA", "D005334"),
    ("C0018681", "ENG", "SNOMEDCT_US", "25064002"),
    ("C0018681", "ENG", "HPO", "HP:0002315"),
    ("C0027497", "ENG", "SNOMEDCT_US", "422587007"),
    ("C0027497", "ENG", "HPO", "HP:0002018"),
    ("C0030193", "ENG", "SNOMEDCT_US", "22253000"),
    ("C0030193", "ENG", "HPO", "HP:0012531"),
    ("C0729608", "ENG", "SNOMEDCT_US", "22653005"),
    ("C0729608", "ENG", "MONDO", "MONDO:0004609"),
    ("C0027059", "ENG", "SNOMEDCT_US", "50920009"),
    ("C0027059", "ENG", "MONDO", "MONDO:0001673"),
    ("C0282687", "ENG", "MONDO", "MONDO:0005737"),
    ("C0282687", "ENG", "ICD10CM", "A98.4"),
    ("C0013595", "ENG", "SNOMEDCT_US", "43116000"),
    ("C0013595", "ENG", "MONDO", "MONDO:0002050"),
    ("C0242225", "ENG", "SNOMEDCT_US", "70173007"),
    ("C0242225", "ENG", "MONDO", "MONDO:0001703"),
    ("C0025160", "ENG", "SNOMEDCT_US", "28536002"),
    ("C0025160", "ENG", "MONDO", "MONDO:0001273"),
    ("C0002940", "ENG", "SNOMEDCT_US", "25362006"),
    ("C0002940", "ENG", "HPO", "HP:0002617"),
    ("C9999901", "ENG", "SNOMEDCT_US", "NOCODE"),
    ("C9999902", "GER", "MSHGER", "D000999"),
]

# MRSTY fixture rows: (CUI, STY) — clinical_concept_annotator.py:182-185.
MRSTY_ROWS = [
    ("C0000744", "Disease or Syndrome"),
    ("C0034063", "Pathologic Function"),
    ("C1260880", "Sign or Symptom"),
    ("C0015967", "Sign or Symptom"),
    ("C0018681", "Sign or Symptom"),
    ("C0027497", "Sign or Symptom"),
    ("C0030193", "Sign or Symptom"),
    ("C0729608", "Disease or Syndrome"),
    ("C0027059", "Disease or Syndrome"),
    ("C0282687", "Disease or Syndrome"),
    ("C0013595", "Disease or Syndrome"),
    ("C0242225", "Disease or Syndrome"),
    ("C0025160", "Disease or Syndrome"),
    ("C0002940", "Anatomical Abnormality"),
]

# Vocabulary-prefix normalization map: (Primary_Abbreviation, [aliases]).
# Shape per /root/reference/resources/mappings/source_code_vocab_map.csv and
# the constructor loader (clinical_concept_annotator.py:78-85). Includes the
# reference's normalization test vectors (tests/test_data_utils.py:165-183).
VOCAB_MAP_ROWS = [
    # note: the reference's real map is case-sensitive and lists uppercase
    # UMLS SAB spellings as explicit aliases (e.g. `SNOMEDCT_US`) — see
    # resources/mappings/source_code_vocab_map.csv:"snomed" row.
    ("snomed", ["snomed", "snomedct", "snomedct_us", "SNOMEDCT_US", "sctid",
                "snomed_ct_us_2018_03_01"]),
    ("umls", ["umls", "UMLS", "http://linkedlifedata.com/resource/umls/id"]),
    ("icd10", ["icd10", "icd10cm", "ICD10CM", "icd-10"]),
    ("msh", ["msh", "MSH", "mesh"]),
    ("doid", ["doid", "DOID", "do"]),
    ("orphanet", ["orphanet", "ordo", "orpha"]),
    ("hp", ["hp", "hpo", "HPO"]),
    ("mondo", ["mondo", "MONDO"]),
    ("gard", ["gard", "GARD"]),
    ("reactome", ["reactome"]),
]

# Vocabulary of filler words for synthetic transcript text (no ontology term
# contains any of these, so noise never creates accidental matches).
NOISE_WORDS = [
    "please", "review", "yesterday", "report", "customer", "ticket",
    "deploy", "server", "metric", "dashboard", "update", "meeting",
    "schedule", "invoice", "draft", "summary", "thanks", "checking",
    "pipeline", "cluster", "notes", "status", "weekly", "quarterly",
]



def near_miss_labels() -> list[str]:
    """Word-reversed multiword concept labels — the deterministic
    'near-miss' surfaces the generators inject so the TF-IDF tier has
    unlinked-but-similar text to score. ONE definition: this list is
    mirrored into SQL VALUES by the kg/sim oracles and into Spark arrays
    by the generators, and any drift between those copies silently breaks
    Spark-vs-oracle parity."""
    return [
        " ".join(reversed(lb.split()))
        for lb in (c[2].lower() for c in CONCEPTS)
        if " " in lb
    ]


def fh_context_triples() -> dict[str, list[tuple[str, str, str]]]:
    """Per-ontology ``(label, synonym, code)`` surface triples eligible for
    the rich-mode family-history turns (generators.transcripts_from_documents
    rich_mentions): all three surfaces resolve UNIQUELY to the same concept
    (label unique among labels and not also a synonym; synonym unique and
    not a label; dbxref code unique, non-UMLS, and absent from MRCONSO so
    the UMLS/ananke tiers cannot add URIs). A turn carrying such a triple
    under the family-history cue yields an ancestor-only group with all
    three ANCESTOR_{CODE,LABEL,SYNONYM} evidence markers and exactly one
    URI — the end-to-end trigger for ``Automatic Exact - Ancestor``
    (reference assigns_mapping_category, data_utils.py:537-546)."""
    from collections import Counter

    vm = {alias: primary for primary, aliases in VOCAB_MAP_ROWS for alias in aliases}

    def norm(code: str) -> str:
        p, r = code.split(":", 1)
        return f"{vm.get(p, p)}:{r.lower()}"

    mr = set()
    for _cui, lang, sab, code in MRCONSO_ROWS:
        if lang == "ENG" and code != "NOCODE":
            c = f"{sab}:{code.lower()}"
            parts = c.split(":")
            if len(parts) > 2:
                c = ":".join(parts[1:])
            mr.add(norm(c))
    lab_ct = Counter(c[2].lower() for c in CONCEPTS)
    syn_ct = Counter(s.lower() for c in CONCEPTS for s, _t in c[4])
    labels = {c[2].lower() for c in CONCEPTS}
    code_ct = Counter(norm(d) for c in CONCEPTS for d, _t in c[5])
    out: dict[str, list[tuple[str, str, str]]] = {}
    for c in CONCEPTS:
        lab = c[2].lower()
        if lab_ct[lab] != 1 or lab in syn_ct:
            continue
        syns = [s.lower() for s, _t in c[4]
                if syn_ct[s.lower()] == 1 and s.lower() not in labels]
        codes = [d for d, _t in c[5]
                 if not d.upper().startswith("UMLS:")
                 and norm(d) not in mr and code_ct[norm(d)] == 1]
        if syns and codes:
            out.setdefault(c[0], []).append((lab, syns[0], codes[0].lower()))
    return out


def cross_ontology_overlay() -> list[tuple[str, str]]:
    """Deterministic cross-ontology ``(uri, ancestor_uri)`` pairs: hp
    concept i is asserted a subclass of 1–2 mondo concepts and vice versa —
    the imported-superclass pattern real MONDO releases contain (MONDO
    imports/cross-references the HP disease hierarchy). NOT part of
    :func:`closure_pairs` (which the flagship oracles mirror); used only by
    the rich corpus P/R mode (``tools/pr_vs_reference.py --rich``) so that
    turns linking concept-level in one ontology acquire ancestor-ONLY
    evidence in the OTHER ontology. Those groups exercise the reference's
    evidence-validation + partial-marker paths: a cross-ontology STR-only
    group emits NOTHING (the surface fails the other ontology's dictionary
    check, data_utils.py:497-507 — mirrored by the ``__expanded``
    suppression in compile), and a dbxref-fed group carries ANCESTOR_CODE
    alone → the quirk routes it to the ``- Concept`` categories
    (data_utils.py:537-541). The actual ``- Ancestor`` category triggers
    are the family-history turns built from :func:`fh_context_triples`."""
    hp = [OBO + sid for ont, sid, *_ in CONCEPTS if ont == "hp"]
    mondo = [OBO + sid for ont, sid, *_ in CONCEPTS if ont == "mondo"]
    out: list[tuple[str, str]] = []
    for i, u in enumerate(hp):
        out.append((u, mondo[i % len(mondo)]))
        if i % 2:  # every other hp concept gets a SECOND mondo ancestor
            out.append((u, mondo[(i + 3) % len(mondo)]))
    for i, u in enumerate(mondo):
        out.append((u, hp[i % len(hp)]))
        if i % 3 == 1:
            out.append((u, hp[(i + 5) % len(hp)]))
    return out


def closure_pairs() -> list[tuple[str, str]]:
    """Transitive ``(uri, ancestor_uri)`` closure over CONCEPTS' parent
    lists (BFS, discovery order preserved). ONE definition shared by the
    Spark fixture table (generators.ancestors_df) and the oracle's
    dimension builder (kg_oracle) — a drifted copy would break parity in
    exactly the ancestor tier it feeds."""
    parents = {OBO + sid: [OBO + a for a in anc] for _, sid, _, _, _, _, anc in CONCEPTS}
    out: list[tuple[str, str]] = []
    for uri in parents:
        seen: list[str] = []
        stack = list(parents[uri])
        while stack:
            a = stack.pop(0)
            if a not in seen:
                seen.append(a)
                stack.extend(parents.get(a, []))
        out.extend((uri, a) for a in seen)
    return out
