#!/usr/bin/env python3
"""Differential harness: run the REFERENCE renderer (umls2rdf.UmlsClass
.toRDF via UmlsOntology.terms()) over fixture rows, without MySQL.

Driven by ReferenceDifferentialSpec (test scope only). Usage:
`reference_render_diff.py <in.json> <out.json>`. Input: {reference_dir,
sab, ns, load_on_cuis, umls_version, dedupe, tables: {MRCONSO:
[[...18 cols...], ...], MRREL, MRDEF, MRSAT, MRRANK, MRSTY, MRSAB}}.
Output file: JSON {"lang": ..., "has_tree": ..., "classes":
{code: rdf_text}, "errors": [msg]} — a separate file because the
reference prints progress to stdout during load_tables.

The fake UmlsTable serves the same scans `UmlsOntology.load_tables`
issues against MySQL (umls2rdf.py:588-678), dispatching on the FIXED
filter strings that method generates; `lat` compares case-insensitively
(MySQL's default ci collation is what makes `lat = 'eng'` match 'ENG').
mesh_tree replicates the DISTINCT parent/child D-code join
(umls2rdf.py:201-217). Everything downstream — grouping, per-class rel
code resolution, toRDF — is the reference's own code, imported and run.
"""
import collections
import json
import re
import sys
import types


def main(cfg_path, out_path):
    with open(cfg_path) as f:
        cfg = json.load(f)

    # umls2rdf imports pymysql (unavailable, never used here) and conf
    # at module scope — provide both before the import.
    sys.modules["pymysql"] = types.ModuleType("pymysql")
    conf = types.ModuleType("conf")
    conf.UMLS_VERSION = cfg["umls_version"]
    conf.DEDUPE_CLASS_TRIPLES = cfg.get("dedupe", True)
    conf.INCLUDE_SEMANTIC_TYPES = True
    conf.UMLS_BASE_URI = "http://purl.bioontology.org/ontology/"
    conf.PROCESS_ONLY_CURRENT_UMLS_VERSION = False
    sys.modules["conf"] = conf
    sys.path.insert(0, cfg["reference_dir"])
    import umls2rdf

    tables = cfg["tables"]
    if not cfg["load_on_cuis"]:
        # A code-less atom crashes the reference outright (get_code
        # raises inside load_tables' indexing, umls2rdf.py:147,602) —
        # it cannot load such data at all. The engine's C5 lenient mode
        # drops exactly these rows, so the differential runs over the
        # class set the reference can construct.
        tables = dict(tables)
        tables["MRCONSO"] = [a for a in tables["MRCONSO"] if a[13]]

    # Column offsets (FIXTURES.md §A; umls2rdf.py:47-90).
    SAB = {"MRCONSO": 11, "MRREL": 10, "MRDEF": 4, "MRSAT": 9,
           "MRRANK": 1}
    SUPPRESS = {"MRCONSO": 16, "MRREL": 14}

    class FakeUmlsTable(object):
        """Serves load_tables' fixed scan shapes from the JSON rows."""

        def __init__(self, table_name, con, load_select=None):
            self.table_name = table_name
            self.load_select = load_select
            self.rows = tables.get(table_name, [])

        def scan(self, filt=None, limit=None):
            if self.load_select is not None:
                if "DISTINCT TUI, STN, STY" in self.load_select:
                    # generate_semantic_types' scan (umls2rdf.py:157):
                    # SELECT DISTINCT with no ORDER BY — MySQL returns
                    # an unspecified order, so ANY order is a valid
                    # reference result; the fake fixes it to the
                    # canonical (TUI, STN, STY) sort (the same way the
                    # `lat` match fixes MySQL's unspecified ci
                    # collation), which is also the engine's
                    # canonicalization — making the section byte-
                    # comparable rather than set-comparable.
                    seen = sorted(set((r[1], r[2], r[3])
                                      for r in self.rows))
                    for t in seen:
                        yield t
                    return
                # the MRSTY load: sty × unsuppressed conso rows of the
                # SAB, duplicates preserved (umls2rdf.py:664-667)
                m = re.search(r"conso\.SAB = '([^']*)'", self.load_select)
                sab = m.group(1)
                cuis = [a[0] for a in tables["MRCONSO"]
                        if a[11] == sab and a[16] == "N"]
                counts = collections.Counter(cuis)
                for sty in self.rows:
                    for _ in range(counts.get(sty[0], 0)):
                        yield sty
                return
            if filt is None:
                # unfiltered full-table scan (the MRDOC property-docs
                # load, umls2rdf.py:853-864)
                for row in self.rows:
                    yield row
                return
            conds = []
            for clause in filt.split(" AND "):
                m = re.match(r"(\w+) = '([^']*)'$", clause.strip())
                if m:
                    col, val = m.group(1), m.group(2)
                    if col == "SAB":
                        idx = SAB[self.table_name]
                    elif col == "SUPPRESS":
                        idx = SUPPRESS[self.table_name]
                    elif col == "RSAB":
                        idx = 3
                    elif col == "CODE":
                        idx = 13  # only used for the SRC roots scan
                    elif col.lower() == "lat":
                        idx = 1
                    else:
                        raise ValueError("unhandled column " + col)
                    ci = col.lower() == "lat"
                    conds.append((idx, val, ci))
                elif clause.strip() == "CODE IS NOT NULL":
                    conds.append((5, None, False))  # MRSAT.CODE
                else:
                    raise ValueError("unhandled clause " + clause)
            n = 0
            for row in self.rows:
                ok = True
                for idx, val, ci in conds:
                    cell = row[idx]
                    if val is None:
                        ok = cell is not None
                    elif ci:
                        ok = (cell or "").lower() == val.lower()
                    else:
                        ok = cell == val
                    if not ok:
                        break
                if ok:
                    yield row
                    n += 1
                    if limit and n >= limit:
                        return

        def mesh_tree(self):
            # DISTINCT c1.code parent, c2.code child over MSH CHD rels,
            # both codes D% (umls2rdf.py:201-217)
            conso = [a for a in tables["MRCONSO"] if a[11] == "MSH"]
            by_cui = collections.defaultdict(set)
            for a in conso:
                if a[13] and a[13].startswith("D"):
                    by_cui[a[0]].add(a[13])
            edges = collections.defaultdict(set)
            for r in tables["MRREL"]:
                if r[10] == "MSH" and r[3] == "CHD":
                    for parent in by_cui.get(r[0], ()):   # CUI1
                        for child in by_cui.get(r[4], ()):  # CUI2
                            edges[child].add(parent)
            return edges

    umls2rdf.UmlsTable = FakeUmlsTable

    ont = umls2rdf.UmlsOntology(cfg["sab"], cfg["ns"], con=None,
                                load_on_cuis=cfg["load_on_cuis"])
    ont.load_tables()

    classes = {}
    errors = []
    for term in ont.terms():
        try:
            rdf = term.toRDF(lang=umls2rdf.UMLS_LANGCODE_MAP[ont.lang],
                             tree=ont.tree)
            classes[term.code()] = rdf
        except Exception as e:  # the reference's per-term tolerance
            errors.append("%s: %s" % (type(e).__name__, e))

    result = {
        "lang": ont.lang,
        "has_tree": bool(ont.tree),
        "classes": classes,
        "errors": errors,
    }

    if cfg.get("full"):
        # WHOLE-FILE mode (VERDICT r13 #4): run the reference's actual
        # export path — write_into (prefixes + header + classes +
        # duplicate-counter stdout line, umls2rdf.py:745-789), then
        # write_properties over MRDOC-built property_docs
        # (umls2rdf.py:801-824,852-864) and write_semantic_types with
        # with_roots=False (umls2rdf.py:852,892) — exactly the __main__
        # per-SAB sequence, into a temp file returned whole.
        import io
        import tempfile
        property_docs = {}
        for doc_record in FakeUmlsTable("MRDOC", None).scan():
            _type = doc_record[2]   # MRDOC_TYPE
            _expl = doc_record[3]   # MRDOC_DESC
            _key = doc_record[1]    # MRDOC_VALUE
            if _key not in property_docs:
                property_docs[_key] = {}
                property_docs[_key]["dockey"] = doc_record[0]
            if "inverse" in _type:
                _type = "inverse"
            property_docs[_key][_type] = _expl
        ttl_path = tempfile.mktemp(suffix=".ttl")
        old_stdout = sys.stdout
        sys.stdout = captured = io.StringIO()
        try:
            import os
            fout = ont.write_into(ttl_path)
            fout.flush()
            ofs1 = os.path.getsize(ttl_path)   # header + classes
            ont.write_properties(fout, property_docs)
            fout.flush()
            ofs2 = os.path.getsize(ttl_path)   # + property block
            sem = umls2rdf.generate_semantic_types(None, with_roots=False)
            ont.write_semantic_types(sem, fout)
            fout.close()
        finally:
            sys.stdout = old_stdout
        # The header write_into emits is these exact substitutions
        # (umls2rdf.py:750-762) — recomputed with the reference's own
        # meta functions so the byte boundary inside [0, ofs1) is known.
        comment = ("RDF Version of the UMLS ontology %s; converted "
                   "with the UMLS2RDF tool "
                   "(https://github.com/ncbo/umls2rdf), developed by "
                   "the NCBO project.") % ont.ont_code
        alt = ont.ontology_alt_label()
        header = umls2rdf.PREFIXES + umls2rdf.ONTOLOGY_HEADER.substitute(
            dict(uri=ont.ns,
                 comment=umls2rdf.turtle_string(comment),
                 label=umls2rdf.turtle_string(ont.ontology_label()),
                 versioninfo=umls2rdf.turtle_string(
                     ont.ontology_version()),
                 source=umls2rdf.turtle_string(ont.ontology_source()),
                 alt_label_line=((" ;\n    skos:altLabel %s"
                                  % umls2rdf.turtle_string(alt))
                                 if alt else "")))
        with open(ttl_path, "rb") as f:
            blob = f.read()
        hb = header.encode("utf-8")
        assert blob[:len(hb)] == hb, "header recomputation diverged"
        result["header_section"] = header
        result["classes_section"] = blob[len(hb):ofs1].decode("utf-8")
        result["props_section"] = blob[ofs1:ofs2].decode("utf-8")
        result["sem_section"] = blob[ofs2:].decode("utf-8")
        m = re.search(r"duplicate triples skipped: "
                      r"literal=(\d+) object=(\d+) subclass=(\d+)",
                      captured.getvalue())
        result["dup_counts"] = ([int(m.group(i)) for i in (1, 2, 3)]
                                if m else None)

    with open(out_path, "w") as f:
        json.dump(result, f)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
