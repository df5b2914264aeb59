#!/usr/bin/env python3
"""Second-implementation oracle for the scoring x-queries (x5/x6).

Independently recomputes, in pure Python, the field-outcome explosion and
accuracy rollup that graft.analytics.Scoring computes for the
x5_field_outcomes / x6_field_scores battery queries — the same inputs
(the committed ex000 double-encoded truth JSON plus the two deterministic
perturbations SparkEntry applies) through an independent implementation of
the recursive comparator (reference semantics:
benchmark/extraction_utils.py:138-233). CrossImplScoringSpec asserts
row-for-row equality.

Semantics mirrored from the Scala comparator:
  - double-encoded unwrap (parse; if the result is a string, parse again)
  - dict keys full-outer with sorted missing/extra rows
  - arrays: <path>_length row, positional recursion only on equal length
  - Python-style equality at leaves: strings strip+lower, never equal to
    numbers; 2 == 2.0; True == 1; integral doubles normalize through their
    shortest decimal representation (Java BigDecimal.valueOf semantics)
  - raw values: strings verbatim, everything else compact JSON
Caveat (documented, not hit by the fixture): Java Double.toString uses
scientific notation for non-integral doubles >= 1e7 where Python repr does
not; the fixture's numbers are small integers.
"""
import json
import math
import os
from decimal import Decimal


def java_trim(s):
    i, j = 0, len(s)
    while i < j and s[i] <= ' ':
        i += 1
    while j > i and s[j - 1] <= ' ':
        j -= 1
    return s[i:j]


def raw(n):
    if n is None:
        return 'null'
    if isinstance(n, str):
        return n
    return json.dumps(n, separators=(',', ':'), ensure_ascii=False)


def norm(n):
    if n is None:
        return 'null'
    if isinstance(n, str):
        return 's:' + java_trim(n).lower()
    if isinstance(n, bool):
        return 'n:1' if n else 'n:0'
    if isinstance(n, int):
        return 'n:' + str(n)
    if isinstance(n, float):
        if not math.isinf(n) and n.is_integer():
            # Java BigDecimal.valueOf(d).toBigInteger: truncate the SHORTEST
            # DECIMAL repr (not the exact binary value — they differ above
            # 2^53); Decimal(repr(d)) reproduces that
            return 'n:' + str(int(Decimal(repr(n))))
        return 'n:' + repr(n)
    return raw(n)


def parse_maybe_double_encoded(s):
    first = json.loads(s)
    if isinstance(first, str):
        try:
            return json.loads(first)
        except ValueError:
            return first
    return first


def compare_json(doc_id, gt_json, ext_json):
    out = []

    def join(p, k):
        return k if p == '' else p + '.' + k

    def walk(gt, ext, path):
        if isinstance(gt, dict) and isinstance(ext, dict):
            gk, ek = set(gt), set(ext)
            for k in sorted(gk - ek):
                out.append([doc_id, join(path, k), 'missing', raw(gt[k]), ''])
            for k in sorted(ek - gk):
                out.append([doc_id, join(path, k), 'extra', '', raw(ext[k])])
            for k in sorted(gk & ek):
                walk(gt[k], ext[k], join(path, k))
        elif isinstance(gt, list) and isinstance(ext, list):
            if len(gt) == len(ext):
                out.append([doc_id, path + '_length', 'match',
                            str(len(gt)), str(len(ext))])
                for i in range(len(gt)):
                    walk(gt[i], ext[i], '%s[%d]' % (path, i))
            else:
                out.append([doc_id, path + '_length', 'mismatch',
                            str(len(gt)), str(len(ext))])
        else:
            p = path if path else 'value'
            o = 'match' if norm(gt) == norm(ext) else 'mismatch'
            out.append([doc_id, p, o, raw(gt), raw(ext)])

    try:
        walk(parse_maybe_double_encoded(gt_json),
             parse_maybe_double_encoded(ext_json), '')
    except ValueError:
        out.append([doc_id, 'value', 'mismatch', gt_json, ext_json])
    return out


def scores(outcomes):
    by_doc = {}
    for doc_id, _path, outcome, _e, _g in outcomes:
        c = by_doc.setdefault(doc_id, {'match': 0, 'mismatch': 0,
                                       'missing': 0, 'extra': 0})
        c[outcome] += 1
    rows = []
    for doc_id in sorted(by_doc):
        c = by_doc[doc_id]
        total = c['match'] + c['mismatch'] + c['missing']
        accuracy = c['match'] / total * 100.0 if total > 0 else 0.0
        quality = ('perfect' if accuracy == 100.0
                   else 'good' if accuracy >= 80.0 else 'needs_improvement')
        completeness = ((total - c['missing']) / total * 100.0
                        if total > 0 else 0.0)
        rows.append([doc_id, accuracy, total, c['match'], c['mismatch'],
                     c['missing'], c['extra'], quality, completeness])
    return rows


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    gt = open(os.path.join(
        repo, 'src/main/resources/graft/fixtures/ex000_truth.json')).read()
    # the exact perturbations SparkEntry.x5/x6 apply to the raw resource
    perturbed_x5 = (gt
                    .replace('\\"ranking\\":1', '\\"ranking\\":9')
                    .replace('\\"nation\\":\\"Italy\\"', '\\"country\\":\\"Italy\\"'))
    perturbed_x6 = gt.replace('\\"ranking\\":1', '\\"ranking\\":9')

    x5 = (compare_json('ex000_self', gt, gt)
          + compare_json('ex000_perturbed', gt, perturbed_x5))
    x5_sorted = sorted(x5)
    x6 = scores(compare_json('ex000_self', gt, gt)
                + compare_json('ex000_perturbed', gt, perturbed_x6))

    out_dir = os.path.join(repo, 'src/test/resources/graft/corpus_expected')
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, 'scoring_expected.json'), 'w') as f:
        json.dump({'x5': x5_sorted, 'x6': x6}, f, ensure_ascii=False, indent=0)
    print('x5 rows:', len(x5_sorted), 'x6 rows:', len(x6))
    for r in x6:
        print(r)


if __name__ == '__main__':
    main()
