"""Single-process pure-Python oracle for the KG pipeline (FIXTURES.md §5).

Encodes the reference's semantics — CoNLL-style sentence records, first-subword
alignment convention, Viterbi/BIO decode via the `extract_entities` algorithm
(BiLSTM-CRF/5489Project_testv2.ipynb cell 7), strict span matching
(DistilBERT-CRF/src/metrics.py:46-59) — as straight-line loops with NO Ray.

Code-path sharing policy (SURVEY.md §7.3): the oracle shares ONLY the "model"
leaves with the distributed pipeline — the emission function + the single numpy
Viterbi implementation (so decode ties can never differ), the normalization /
hashing constants that define identity, and the MinHash BAND CONSTANTS of the
LSH candidate filter (the recall bound at the Jaccard threshold is part of the
canonicalization contract, so both sides must block identically). Extraction,
sentence splitting, word tokenization, BIO decode, relation matching, linking,
in-bucket verification and union-find are REIMPLEMENTED here as independent
sequential code, so a pipeline-vs-oracle diff isolates orchestration bugs.
"""

from __future__ import annotations

import html as _htmllib

from ner_extractor_ray.functions.gazetteer import (
    RELATION_PATTERNS,
    alias_canonical_map,
    gazetteer_token_trie,
    normalize_surface,
)
from ner_extractor_ray.functions.hashing import stable_id
from ner_extractor_ray.functions.tagging import emissions_for_sentence  # shared model
from ner_extractor_ray.functions.viterbi import viterbi_decode  # shared decoder
from ner_extractor_ray import LABELS

_STRIP_TAGS = ("script", "style", "nav", "header", "footer")


# ------------------------------------------------------------ extraction

def _find_ci(haystack: str, needle: str, start: int = 0) -> int:
    return haystack.lower().find(needle, start)


def extract_text(html_bytes: bytes) -> str:
    """Sequential state-machine reimplementation of S1 extraction."""
    if html_bytes is None:
        return ""
    doc = html_bytes.decode("utf-8", errors="replace")
    for tag in _STRIP_TAGS:
        out = []
        pos = 0
        while True:
            i = _find_ci(doc, "<" + tag, pos)
            if i < 0:
                out.append(doc[pos:])
                break
            j = _find_ci(doc, "</" + tag + ">", i)
            out.append(doc[pos:i])
            out.append(" ")
            pos = len(doc) if j < 0 else j + len(tag) + 3
        doc = "".join(out)
    paras = []
    pos = 0
    while True:
        i = _find_ci(doc, "<p", pos)
        if i < 0:
            break
        o = doc.find(">", i)
        j = _find_ci(doc, "</p>", o)
        if o < 0 or j < 0:
            break
        inner = doc[o + 1 : j]
        # strip inner tags char-by-char
        buf, in_tag = [], False
        for ch in inner:
            if ch == "<":
                in_tag = True
                buf.append(" ")
            elif ch == ">":
                in_tag = False
            elif not in_tag:
                buf.append(ch)
        txt = " ".join(_htmllib.unescape("".join(buf)).split())
        if txt:
            paras.append(txt)
        pos = j + 4
    return "\n".join(paras)


# -------------------------------------------------- sentence / word tokens

def split_sentences(text: str) -> list[str]:
    """Boundary after a standalone [.!?] word; newline always a boundary."""
    sents = []
    for line in text.split("\n"):
        words = line.split()
        cur: list[str] = []
        for w in words:
            cur.append(w)
            if w in (".", "!", "?"):
                sents.append(" ".join(cur))
                cur = []
        if cur:
            sents.append(" ".join(cur))
    return sents


def _is_alnum(c: str) -> bool:
    return c.isascii() and c.isalnum()


def tokenize_words(sentence: str) -> list[str]:
    """Char-level reimplementation of the pipeline's token regex semantics."""
    toks: list[str] = []
    i, n = 0, len(sentence)
    while i < n:
        c = sentence[i]
        if c.isspace():
            i += 1
            continue
        if _is_alnum(c):
            j = i
            while j < n and _is_alnum(sentence[j]):
                j += 1
            # internal [.'] joins when followed by alnum
            while j < n and sentence[j] in ".'" and j + 1 < n and _is_alnum(sentence[j + 1]):
                j += 1
                while j < n and _is_alnum(sentence[j]):
                    j += 1
            if j < n and sentence[j] == ".":
                j += 1  # optional trailing period attaches
            tok = sentence[i:j]
            if len(tok) > 1 and tok.endswith(".") and tok.count(".") == 1:
                toks.append(tok[:-1])
                toks.append(".")
            else:
                toks.append(tok)
            i = j
        else:
            toks.append(c)
            i += 1
    return toks


# ------------------------------------------------------------- NER decode

def decode_spans(tags: list[str]) -> list[tuple[str, int, int]]:
    """Own BIO→span loop (fix-orphan-I inline, then B starts / I extends)."""
    fixed = []
    prev = "O"
    for t in tags:
        if t.startswith("I-") and prev not in (f"B-{t[2:]}", f"I-{t[2:]}"):
            t = "B-" + t[2:]
        fixed.append(t)
        prev = t
    spans = []
    start, cur = -1, None
    for i, t in enumerate(fixed):
        if t.startswith("B-"):
            if cur is not None:
                spans.append((cur, start, i))
            cur, start = t[2:], i
        elif t.startswith("I-") and cur == t[2:]:
            pass
        else:
            if cur is not None:
                spans.append((cur, start, i))
            cur = None
    if cur is not None:
        spans.append((cur, start, len(fixed)))
    return spans


# ----------------------------------------------------------- full pipeline

def run_oracle(pages_rows: list[dict]) -> dict:
    """pages rows (url, html, text, lang) → {text_by_url, mentions, triples,
    nodes, edges} — sequential reference semantics."""
    trie = gazetteer_token_trie()
    alias = alias_canonical_map()

    text_by_url: dict[str, str] = {}
    mentions: list[dict] = []
    triples: list[dict] = []

    for row in pages_rows:
        url = row["url"]
        text = row.get("text") or extract_text(row.get("html"))
        text_by_url[url] = text
        if row.get("lang") != "en":
            continue
        for sid, sent in enumerate(split_sentences(text)):
            tokens = tokenize_words(sent)[:192]
            if not tokens:
                continue
            em = emissions_for_sentence(tokens, trie)
            tags = [LABELS[i] for i in viterbi_decode(em)]
            spans = decode_spans(tags)
            for (typ, s, e) in spans:
                surface = " ".join(tokens[s:e])
                norm = normalize_surface(surface)
                norm = alias.get(norm, norm)
                mentions.append(
                    {
                        "url": url, "sent_id": sid, "start": s, "end": e,
                        "type": typ, "surface": surface, "norm_key": norm,
                        "node": f"{typ}:{norm}",
                    }
                )
            spans_sorted = sorted(spans, key=lambda x: x[1])
            for (t1, s1, e1), (t2, s2, e2) in zip(spans_sorted, spans_sorted[1:]):
                gap = " ".join(tokens[e1:s2])
                pat = RELATION_PATTERNS.get(gap)
                if pat is None:
                    continue
                pred, role, w1, w2 = pat
                if (w1 != "*" and t1 != w1) or (w2 != "*" and t2 != w2):
                    continue
                m1, m2 = " ".join(tokens[s1:e1]), " ".join(tokens[s2:e2])
                if role == "first":
                    subj, styp, obj, otyp = m1, t1, m2, t2
                else:
                    subj, styp, obj, otyp = m2, t2, m1, t1
                triples.append(
                    {"url": url, "sent_id": sid, "subj": subj, "subj_type": styp,
                     "pred": pred, "obj": obj, "obj_type": otyp}
                )

    # canonicalization: union-find over distinct nodes, exact pairwise Jaccard
    def shingles(s: str) -> set:
        s2 = " ".join(s.split()).lower()
        if len(s2) < 3:
            return {s2} if s2 else set()
        return {s2[i : i + 3] for i in range(len(s2) - 2)}

    nodes_meta: dict[str, dict] = {}
    for m in mentions:
        meta = nodes_meta.setdefault(
            m["node"], {"type": m["type"], "norm_key": m["norm_key"], "n": 0}
        )
        meta["n"] += 1
    node_list = sorted(nodes_meta)
    parent = {n: n for n in node_list}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = sorted((ra, rb))
            parent[hi] = lo

    # Candidate filter = the SAME MinHash band collisions as the pipeline
    # (imported constants/functions, not reimplemented): the LSH recall bound
    # — P(candidate) ≈ 0.89 at Jaccard exactly 0.6, → 1 as similarity grows —
    # is part of the canonicalization CONTRACT, so the oracle applies it too
    # and parity is exact by construction rather than data-dependent.
    # Verification inside a bucket stays exact pairwise Jaccard.
    from ner_extractor_ray.functions.textfns import band_keys, minhash_signature
    from ner_extractor_ray.stages.canonicalize import N_BANDS, NUM_PERM, _bucket_key

    buckets: dict[int, list[str]] = {}
    for n in node_list:
        sig = minhash_signature(
            sorted(shingles(nodes_meta[n]["norm_key"])), NUM_PERM
        )
        for bi, h in enumerate(band_keys(sig, N_BANDS)):
            buckets.setdefault(_bucket_key(bi, h), []).append(n)
    seen_pairs: set[tuple[str, str]] = set()
    for members in buckets.values():
        ms = sorted(set(members))
        for i, a in enumerate(ms):
            sa = shingles(nodes_meta[a]["norm_key"])
            for b in ms[i + 1 :]:
                if (a, b) in seen_pairs:
                    continue
                seen_pairs.add((a, b))
                if nodes_meta[a]["type"] != nodes_meta[b]["type"]:
                    continue
                sb = shingles(nodes_meta[b]["norm_key"])
                inter = len(sa & sb)
                uni = len(sa) + len(sb) - inter
                if uni and inter / uni >= 0.6:
                    union(a, b)

    comp_of = {n: find(n) for n in node_list}
    comp_members: dict[str, list[str]] = {}
    for n, c in comp_of.items():
        comp_members.setdefault(c, []).append(n)
    entity_of: dict[str, str] = {}
    nodes_out: dict[str, dict] = {}
    for c, members in comp_members.items():
        rep = min(members)
        eid = stable_id(f"ent:{rep}")
        canonical = min(nodes_meta[m]["norm_key"] for m in members)
        for m in members:
            entity_of[m] = eid
        nodes_out[eid] = {
            "entity_id": eid,
            "canonical_name": canonical,
            "type": nodes_meta[rep]["type"],
            "n_mentions": sum(nodes_meta[m]["n"] for m in members),
        }

    edges_out: dict[tuple, dict] = {}
    for t in triples:
        sn = normalize_surface(t["subj"])
        on = normalize_surface(t["obj"])
        sn = alias.get(sn, sn)
        on = alias.get(on, on)
        sid_ = entity_of.get(f"{t['subj_type']}:{sn}")
        oid_ = entity_of.get(f"{t['obj_type']}:{on}")
        key = (sid_, t["pred"], oid_)
        prov = f"{t['url']}#{t['sent_id']:06d}"
        e = edges_out.setdefault(
            key,
            {"subj_id": sid_, "pred": t["pred"], "obj_id": oid_,
             "n_occurrences": 0, "prov": prov},
        )
        e["n_occurrences"] += 1
        e["prov"] = min(e["prov"], prov)

    return {
        "text_by_url": text_by_url,
        "mentions": mentions,
        "triples": triples,
        "nodes": sorted(nodes_out.values(), key=lambda d: d["entity_id"]),
        "edges": sorted(
            edges_out.values(), key=lambda d: (d["subj_id"], d["pred"], d["obj_id"])
        ),
    }
