#!/usr/bin/env python3
"""Transcribe golden fixtures from the public reference repo snapshot
(/root/reference, satish860/OCR-Deployment) into test resources.

Inputs (all public content in the reference repo):
  - results/multi_page_results.json  pages 0/1/2 (page 1 truncated at
    max_tokens -> tolerant-parse fixture)
  - benchmark/results/test_results_20250816_133103.json modal_result
    (leading prose before the JSON array -> recovery fixture)
  - benchmark/data/example_000_truth.{json,md} + metadata

Expected span sequences are computed here in *Python*, independently of the
Scala kernel, so the golden suite is a genuine cross-implementation check:
  kind = category, text (Picture -> ""), media_ref = bbox://x1,y1,x2,y2 for
  JSON-born pictures, offset = XY-cut reading-order index. Ordering uses the
  Python reading-order implementation (recompute_corpus.py) — for most
  reference pages that equals the file's emission order, but pages with
  vertically overlapping boxes (lb_page7) are reordered by the documented
  XY-cut contract, and the pin stays Python-vs-Scala cross-implementation.
"""
import importlib.util, json, os, re

REF = "/root/reference"
OUT = "/root/repo/src/main/resources/graft/fixtures"
os.makedirs(OUT, exist_ok=True)

_spec = importlib.util.spec_from_file_location(
    "recompute_corpus",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "recompute_corpus.py"))
rc = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(rc)


def elements_to_spans(elements):
    els = [rc.El(float(e["bbox"][0]), float(e["bbox"][1]),
                 float(e["bbox"][2]), float(e["bbox"][3]), e["category"],
                 "" if e["category"] == "Picture" else e.get("text", ""))
           for e in elements]
    spans = []
    for i, e in enumerate(rc.reading_order(els)):
        ref = e.bbox_ref() if e.category == "Picture" else ""
        spans.append({"kind": e.category, "text": e.text,
                      "media_ref": ref, "offset": i})
    return spans


def tolerant_parse(raw):
    """Replicates the reference recovery semantics: slice from first '[',
    collect complete objects until the input ends mid-element."""
    t = raw.strip()
    if t.startswith("```"):
        t = t.split("\n", 1)[1] if "\n" in t else ""
        if t.endswith("```"):
            t = t[:-3]
        t = t.strip()
    i = t.find("[")
    if i < 0:
        return None, "JSON_RECOVERY_FAILED"
    t = t[i:]
    try:
        return json.loads(t), ""
    except Exception:
        pass
    dec = json.JSONDecoder()
    pos = 1  # skip '['
    out = []
    while True:
        while pos < len(t) and t[pos] in " \t\r\n,":
            pos += 1
        if pos >= len(t) or t[pos] == "]":
            break
        try:
            obj, end = dec.raw_decode(t, pos)
        except Exception:
            return out, "TRUNCATED"
        out.append(obj)
        pos = end
    return out, "TRUNCATED"  # no closing ']' reached via json.loads


def md_table_to_html(md):
    """Reference markdown-table semantics (tests/test_single_page.py:93-139)
    + HTML shape (:141-182)."""
    rows = []
    for line in md.split("\n"):
        line = line.strip()
        if "|" in line and len(line.split("|")) >= 3:
            if re.match(r"^[\|\s\-]+$", line):
                continue
            row = [c.strip() for c in line.split("|") if c.strip()]
            if row:
                rows.append(row)
    if len(rows) < 2:
        return None
    html = "<table><thead><tr>"
    html += "".join(f"<th>{c}</th>" for c in rows[0])
    html += "</tr></thead><tbody>"
    for r in rows[1:]:
        html += "<tr>" + "".join(f"<td>{c}</td>" for c in r) + "</tr>"
    html += "</tbody></table>"
    return html, len(rows)


def main():
    mp = json.load(open(f"{REF}/results/multi_page_results.json"))
    expected = {}
    for pg in (0, 1, 2):
        raw = mp["results"][pg]["result"]
        open(f"{OUT}/mp_page{pg}.txt", "w").write(raw)
        els, code = tolerant_parse(raw)
        expected[f"fixture_mp_page{pg}"] = {
            "failure_code": code,
            "success": code in ("", "TRUNCATED", "SCHEMA_VIOLATION"),
            "spans": elements_to_spans(els),
        }

    # multi-page batch fixture: all three pages as one interleaved doc;
    # offsets renumber sequentially, worst page failure code wins
    all_spans = []
    for pg in (0, 1, 2):
        all_spans.extend(expected[f"fixture_mp_page{pg}"]["spans"])
    for i, s in enumerate(all_spans):
        s = dict(s); s["offset"] = i; all_spans[i] = s
    expected["fixture_mp_all"] = {
        "failure_code": "TRUNCATED", "success": True, "spans": all_spans}

    # large_batch_results.json pages 3-8: six further real model outputs,
    # every one a DIFFERENT tolerant-parse failure shape (mid-string cut,
    # mid-table-HTML cut, mid-number cut, missing delimiter, repetition
    # loop swallowing the whole first element) — the breadth the recovery
    # kernel needs hard evidence against. Pages 0-2 are byte-identical to
    # the multi_page fixtures already transcribed and are skipped.
    lb = json.load(open(f"{REF}/results/large_batch_results.json"))
    for pg in (3, 4, 5, 6, 7, 8):
        raw = lb["results"][pg]["result"]
        open(f"{OUT}/lb_page{pg}.txt", "w").write(raw)
        els, code = tolerant_parse(raw)
        expected[f"fixture_lb_page{pg}"] = {
            "failure_code": code,
            "success": code in ("", "TRUNCATED", "SCHEMA_VIOLATION"),
            "spans": elements_to_spans(els),
        }

    # client_parallel re-runs of the same page as mp_page1: two further
    # INDEPENDENT generations of that document (cp6 diverges from mp at
    # char 32 — different sampling run, not just a different truncation
    # byte) — same document, distinct element text and recovery prefixes
    for fname, key in (("client_parallel_3pages_results.json", "cp3_page0"),
                       ("client_parallel_6pages_results.json", "cp6_page0")):
        cp = json.load(open(f"{REF}/results/{fname}"))
        raw = cp["results"][0]["result"]
        open(f"{OUT}/{key}.txt", "w").write(raw)
        els, code = tolerant_parse(raw)
        expected[f"fixture_{key}"] = {
            "failure_code": code,
            "success": code in ("", "TRUNCATED", "SCHEMA_VIOLATION"),
            "spans": elements_to_spans(els),
        }

    tr = json.load(open(f"{REF}/benchmark/results/test_results_20250816_133103.json"))
    raw = tr["modal_result"]
    open(f"{OUT}/ex000_ocr.txt", "w").write(raw)
    els, code = tolerant_parse(raw)
    expected["fixture_ex000_ocr"] = {
        "failure_code": code,
        "success": code in ("", "TRUNCATED", "SCHEMA_VIOLATION"),
        "spans": elements_to_spans(els),
    }

    md = open(f"{REF}/benchmark/data/example_000_truth.md").read()
    if md.lstrip().startswith('"'):  # file is a JSON-encoded string (the
        md = json.loads(md)          # reference's double-encoding quirk,
                                     # run_batch_benchmark.py:73-79)
    open(f"{OUT}/ex000_truth_md.txt", "w").write(md)
    html, nrows = md_table_to_html(md)
    # markdown page: a lone pipe table -> one Table span (deterministic layout
    # geometry is kernel-internal; spans carry no bbox)
    expected["fixture_ex000_truth_md"] = {
        "failure_code": "",
        "success": True,
        "spans": [{"kind": "Table", "text": html, "media_ref": "", "offset": 0}],
    }

    # double-encoded truth json + metadata, for the scoring fixtures
    open(f"{OUT}/ex000_truth.json", "w").write(
        open(f"{REF}/benchmark/data/example_000_truth.json").read())
    open(f"{OUT}/ex000_metadata.json", "w").write(
        open(f"{REF}/benchmark/data/example_000_metadata.json").read())

    json.dump(expected, open(f"{OUT}/expected.json", "w"),
              ensure_ascii=False, indent=1)
    for k, v in expected.items():
        print(k, v["failure_code"], len(v["spans"]))


if __name__ == "__main__":
    main()
