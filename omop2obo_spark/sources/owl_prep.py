"""OWL/XML → lexicon-parquet offline prep tool.

Replaces the reference's rdflib-based lexicon build
(/root/reference/omop2obo/ontology_explorer.py:43-72 +
/root/reference/omop2obo/utils/ontology_utils.py:29-199): parse an OBO-style
RDF/XML ontology file and emit the lexicon table consumed by
``LexiconDims.from_lexicon`` (schema ``fixtures.generators.LEXICON_SCHEMA``:
ont, kind, norm_string, uri, subtype).

Extraction semantics mirror the reference exactly, including its
substring-based predicate matching:

  * classes    — subjects typed ``owl:Class`` whose URI contains the
                 ontology id, case-insensitive (ontology_utils.py:46)
  * deprecated — subjects with ``owl:deprecated "true"`` are excluded
                 (ontology_utils.py:196-197, ontology_explorer.py:59-60)
  * label      — any predicate whose URI contains ``label`` (:71)
  * definition — predicate containing ``IAO_0000115`` (:97, case-sensitive)
  * synonym    — predicate containing ``synonym``; subtype = predicate local
                 name after ``#`` (:126-130)
  * dbxref     — predicate containing ``hasdbxref`` → subtype ``DbXref``;
                 ``exactmatch`` → ``ExactMatch`` (:163-175)

All extracted strings are lower-cased, as the reference lower-cases every
dict key. Divergence (documented): the reference stores ``{string: uri}``
dicts, so a string shared by two classes keeps only the last-written URI;
this tool emits the full long table (one row per (kind, string, uri) pair)
— strictly more information — and ``LexiconDims`` resolves precedence
explicitly (operators/linking.py). Pass ``collapse=True`` to reproduce the
dict shape (one URI per string, last-write-wins by max URI).

This container has no rdflib, so parsing is a streaming
``xml.etree.iterparse`` over the common OBO RDF/XML serialization (subject
elements carrying ``rdf:about``, predicate child elements with text
literals or ``rdf:resource`` objects). That covers OBO ontology releases
(HP/MONDO/CHEBI/SO); exotic RDF/XML forms (nested bnode subjects) are out
of scope for lexicon extraction.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from collections.abc import Iterator

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
OWL_CLASS = "http://www.w3.org/2002/07/owl#Class"
ABOUT = f"{{{RDF_NS}}}about"
RESOURCE = f"{{{RDF_NS}}}resource"
RDF_TYPE = RDF_NS + "type"  # predicate-URI form (matches _pred_uri output)

LEXICON_COLS = ["ont", "kind", "norm_string", "uri", "subtype"]


def _pred_uri(tag: str) -> str:
    """ElementTree tag ``{ns}local`` → predicate URI ``ns+local``
    (OBO namespaces end in ``#`` or ``/``, both already part of ns)."""
    if tag.startswith("{"):
        ns, local = tag[1:].split("}", 1)
        return ns + local
    return tag


def iter_subject_triples(path: str) -> Iterator[tuple[str, str, str, bool]]:
    """Stream (subject_uri, predicate_uri, object_value, object_is_uri)
    triples from the top-level subject elements of an RDF/XML file."""
    # depth tracking: subject elements are depth-1 children of rdf:RDF
    depth = 0
    subject: str | None = None
    subject_is_class = False
    pending: list[tuple[str, str, bool]] = []
    for event, elem in ET.iterparse(path, events=("start", "end")):
        if event == "start":
            depth += 1
            if depth == 2:
                subject = elem.get(ABOUT)
                subject_is_class = _pred_uri(elem.tag) == OWL_CLASS
                pending = []
            continue
        # end events
        if depth == 3 and subject is not None:
            pred = _pred_uri(elem.tag)
            res = elem.get(RESOURCE)
            if res is not None:
                pending.append((pred, res, True))
            elif elem.text is not None and elem.text.strip():
                pending.append((pred, elem.text.strip(), False))
        elif depth == 2:
            if subject is not None:
                if subject_is_class:
                    yield subject, RDF_TYPE, OWL_CLASS, True
                yield from ((subject, p, o, u) for p, o, u in pending)
            subject = None
            elem.clear()  # free memory — streaming parse
        depth -= 1


def extract_lexicon_rows(path: str, ont_id: str, collapse: bool = False) -> list[tuple]:
    """Parse one ontology file → lexicon rows (ont, kind, norm_string, uri,
    subtype), reference semantics per module docstring."""
    ont_l = ont_id.lower()
    classes: set[str] = set()
    deprecated: set[str] = set()
    triples: list[tuple[str, str, str, bool]] = []
    for s, p, o, is_uri in iter_subject_triples(path):
        if ont_l not in s.lower():
            continue
        if p == RDF_TYPE and o == OWL_CLASS:
            classes.add(s)
            continue
        if "deprecated" in p.lower() and not is_uri and o.lower() == "true":
            deprecated.add(s)
            continue
        triples.append((s, p, o, is_uri))

    keep = classes - deprecated
    rows: list[tuple] = []
    for s, p, o, is_uri in triples:
        if s not in keep:
            continue
        pl = p.lower()
        if "hasdbxref" in pl:
            rows.append((ont_l, "dbxref", o.lower(), s, "DbXref"))
        elif "exactmatch" in pl:
            val = o.lower()
            rows.append((ont_l, "dbxref", val, s, "ExactMatch"))
        elif "synonym" in pl and not is_uri:
            rows.append((ont_l, "synonym", o.lower(), s, p.split("#")[-1]))
        elif "IAO_0000115" in p and not is_uri:
            rows.append((ont_l, "definition", o.lower(), s, None))
        elif "label" in pl and not is_uri:
            rows.append((ont_l, "label", o.lower(), s, None))

    if collapse:
        # reference dict shape: one URI per (kind, string), last-write-wins
        # — resolved deterministically by max (uri, subtype)
        best: dict[tuple[str, str], tuple[str, str | None]] = {}
        for ont, kind, string, uri, subtype in rows:
            k = (kind, string)
            cand = (uri, subtype)
            if k not in best or cand > best[k]:
                best[k] = cand
        rows = [(ont_l, kind, string, uri, subtype)
                for (kind, string), (uri, subtype) in best.items()]
    return sorted(set(rows))


def extract_hierarchy_edges(path: str, ont_id: str) -> list[tuple[str, str]]:
    """Parse one ontology file → direct ``(uri, parent_uri)`` subClassOf
    edges between named, non-deprecated classes of the ontology.

    The reference walks these same ``rdfs:subClassOf`` parents one class
    at a time on the driver to build its ancestor dictionary
    (/root/reference/omop2obo/utils/ontology_utils.py:229-266); here the
    edge list is the INPUT to the distributed
    :func:`omop2obo_spark.operators.hierarchy.ancestor_closure`.

    Anonymous parents (OWL restrictions — bnode objects with no
    ``rdf:resource``) carry no ancestor semantics for the lexicon and are
    naturally skipped by the streaming parser; edges into other
    ontologies' namespaces are excluded like every other extraction
    (namespace filter, ontology_utils.py:46).
    """
    ont_l = ont_id.lower()
    classes: set[str] = set()
    deprecated: set[str] = set()
    raw_edges: list[tuple[str, str]] = []
    for s, p, o, is_uri in iter_subject_triples(path):
        if ont_l not in s.lower():
            continue
        if p == RDF_TYPE and o == OWL_CLASS:
            classes.add(s)
        elif "deprecated" in p.lower() and not is_uri and o.lower() == "true":
            deprecated.add(s)
        elif "subclassof" in p.lower() and is_uri and ont_l in o.lower():
            raw_edges.append((s, o))
    keep = classes - deprecated
    return sorted({(c, par) for c, par in raw_edges if c in keep and par in keep})


def write_edges_parquet(edges: list[tuple[str, str]], out_path: str) -> None:
    """Write (uri, parent_uri) edges as parquet readable by spark."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    cols = list(zip(*edges)) if edges else [[], []]
    table = pa.table(
        {
            "uri": pa.array(list(cols[0]), type=pa.string()),
            "parent_uri": pa.array(list(cols[1]), type=pa.string()),
        }
    )
    pq.write_table(table, out_path)


def write_lexicon_parquet(rows: list[tuple], out_path: str) -> None:
    """Write lexicon rows as parquet readable by spark.read.parquet."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    cols = list(zip(*rows)) if rows else [[]] * 5
    table = pa.table(
        {name: pa.array(list(col), type=pa.string()) for name, col in zip(LEXICON_COLS, cols)}
    )
    pq.write_table(table, out_path)


def owl_to_lexicon(owl_path: str, ont_id: str, out_path: str, collapse: bool = False) -> int:
    """CLI entry: OWL/XML file → lexicon parquet. Returns row count."""
    rows = extract_lexicon_rows(owl_path, ont_id, collapse)
    write_lexicon_parquet(rows, out_path)
    return len(rows)


if __name__ == "__main__":
    import sys

    if len(sys.argv) < 4:
        print("usage: python -m omop2obo_spark.sources.owl_prep <owl> <ont_id> <out.parquet> [--collapse]")
        raise SystemExit(2)
    n = owl_to_lexicon(sys.argv[1], sys.argv[2], sys.argv[3], "--collapse" in sys.argv)
    print(f"wrote {n} lexicon rows")
