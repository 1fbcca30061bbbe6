"""Deterministic synthetic Common-Crawl-style pages generator + gold tables.

Produces the input table of BASELINE.json's ``input_hint``:
    (url: string, warc_ts: timestamp[us], html: binary, text: string, lang: string)
together with driver-side ground truth (FIXTURES.md §2):
    gold_text(url, text)                       — byte-exact extraction target
    gold_mentions(url, sent_id, start, end, type, surface)
    gold_triples(url, sent_id, subj, pred, obj)
    gold_entities(surface, canonical)          — alias groups for linking tests

Every random choice is a pure function of ``(seed, page_index)`` via a per-page
``RandomState(stable_hash64(...))`` — never global RNG call order — so output is
identical at any parallelism and generation could itself be distributed
(contrast: the reference's seeded global RNG, DistilBERT-CRF/src/utils.py:19-27).

Sentences are built token-first from relation templates over the fixed
gazetteers, so gold mentions/triples are known exactly; text = " ".join(tokens)
and the HTML wraps that text in template boilerplate the extractor must strip.
Head-domain skew is planted (Zipf over domains) to exercise salting.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.gazetteer import ALIAS_GROUPS, GAZETTEER, normalize_surface
from ..functions.hashing import stable_hash64, stable_id

_DOMAINS = [
    "news.example.com", "blog.example.org", "wiki.example.net", "press.acme.io",
    "tech.daily.example", "media.globex.example", "reports.initech.example",
    "archive.example.edu", "journal.example.co", "feed.hooli.example",
    "docs.example.dev", "paper.example.ai",
]
# Zipf-ish weights: head domain owns a large share (skew fixture, FIXTURES.md §4)
_DOMAIN_W = np.array([1.0 / (i + 1) for i in range(len(_DOMAINS))])
_DOMAIN_CDF = np.cumsum(_DOMAIN_W / _DOMAIN_W.sum())

_EPOCH_US = 1_577_836_800_000_000  # 2020-01-01T00:00:00Z in microseconds

# (template tokens with slots, [(subj_slot, pred, obj_slot)] )
# Slots: P=PER, O=ORG, O2=second ORG, L=LOC, M=MISC.
_REL_TEMPLATES: list[tuple[list[str], list[tuple[str, str, str]]]] = [
    (["{P}", "founded", "{O}", "."], [("P", "founded", "O")]),
    (["{O}", "was", "founded", "by", "{P}", "."], [("P", "founded", "O")]),
    (["{P}", "works", "for", "{O}", "."], [("P", "works_for", "O")]),
    (["{O}", "is", "located", "in", "{L}", "."], [("O", "located_in", "L")]),
    (["{O}", "is", "based", "in", "{L}", "."], [("O", "located_in", "L")]),
    (["{O}", "acquired", "{O2}", "."], [("O", "acquired", "O2")]),
    (["{P}", "was", "born", "in", "{L}", "."], [("P", "born_in", "L")]),
    (["{P}", "visited", "{L}", "."], [("P", "visited", "L")]),
]
_PLAIN_TEMPLATES: list[list[str]] = [
    ["The", "quarterly", "report", "was", "published", "on", "time", "."],
    ["Analysts", "expected", "growth", "of", "7", "percent", "this", "year", "."],
    ["The", "{M}", "delegation", "arrived", "in", "{L}", "."],
    ["Officials", "declined", "to", "comment", "on", "the", "matter", "."],
    ["Shares", "rose", "3.5", "percent", "after", "the", "announcement", "."],
    ["The", "{M}", "researcher", "joined", "{O}", "."],
]
_DE_FILLER = [
    "der Bericht ist von der Kommission und wird nicht veröffentlicht .",
    "die Ergebnisse sind gut und das Team ist mit der Arbeit zufrieden .",
]

_PAGE_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
])


def _pick(rng: np.random.RandomState, items: list[str]) -> str:
    return items[int(rng.randint(0, len(items)))]


def _fill_template(rng, template, triples_spec):
    """Instantiate one template → (tokens, mentions[(type,start,end,surface)],
    triples[(subj_surface, pred, obj_surface)])."""
    slot_vals: dict[str, tuple[str, str]] = {}  # slot → (surface, type)
    for slot, typ in (("P", "PER"), ("O", "ORG"), ("O2", "ORG"),
                      ("L", "LOC"), ("M", "MISC")):
        if any(t == "{%s}" % slot for t in template):
            surf = _pick(rng, GAZETTEER[typ])
            if slot == "O2":  # distinct ORG pair for `acquired`
                while surf == slot_vals.get("O", ("", ""))[0]:
                    surf = _pick(rng, GAZETTEER["ORG"])
            slot_vals[slot] = (surf, typ)
    tokens: list[str] = []
    mentions: list[tuple[str, int, int, str]] = []
    for t in template:
        if t.startswith("{"):
            slot = t[1:-1]
            surf, typ = slot_vals[slot]
            parts = surf.split()
            mentions.append((typ, len(tokens), len(tokens) + len(parts), surf))
            tokens.extend(parts)
        else:
            tokens.append(t)
    triples = [
        (slot_vals[s][0], pred, slot_vals[o][0]) for (s, pred, o) in triples_spec
    ]
    return tokens, mentions, triples


def _render_html(
    rng, paragraphs: list[str], title: str,
    links: list[tuple[str, str]] | None = None,
) -> bytes:
    nav = "<nav><a href='/'>home</a> <a href='/about'>about</a></nav>"
    script = "<script>var t=Date.now();track(t);</script>"
    style = "<style>p{margin:0}</style>"
    body = "".join(f"<p>{p}</p>" for p in paragraphs)
    # Outbound links live in an <aside> — OUTSIDE every <p> — so
    # extract_text's paragraph-only contract (and the byte-identical
    # gold_text invariant) is untouched while extract_links sees them.
    aside = (
        "<aside>" + "".join(f'<a href="{u}">{a}</a>' for u, a in links) + "</aside>"
        if links else ""
    )
    ad = "<footer>© example — all rights reserved</footer>"
    html = (
        f"<html><head><title>{title}</title>{style}{script}</head>"
        f"<body>{nav}{body}{aside}{ad}</body></html>"
    )
    return html.encode("utf-8")


# ------------------------------------------------------------- link planting

_ANCHOR_PHRASES = [
    "read more", "full story", "related coverage", "see the analysis",
    "background briefing",
]
_LINK_UNIVERSE = 20_000  # target index space; targets may dangle (uncrawled)


def _domain_of(seed: int, j: int, _cache: dict = {}) -> str:
    """Domain of page ``j`` — replays page-j's FIRST rng draw, so link targets
    carry the same url a later crawl of article-j would have. Memoized: the
    Pareto head means most links hit a few hub indices."""
    key = (seed, j)
    d = _cache.get(key)
    if d is None:
        r = np.random.RandomState(stable_hash64(f"page:{seed}:{j}") % (2**32))
        d = _DOMAINS[int(np.searchsorted(_DOMAIN_CDF, r.uniform()))]
        if len(_cache) < 200_000:
            _cache[key] = d
    return d


def _gen_links(seed: int, i: int) -> list[tuple[str, str]]:
    """Deterministic outlinks of page ``i``: 0-5 targets with Pareto head
    skew (a few hub articles attract most inlinks — the link-graph analog of
    the planted head-domain skew). Independent rng stream (``links:`` salt),
    so adding links never perturbs the page's text/mention draws."""
    rng = np.random.RandomState(stable_hash64(f"links:{seed}:{i}") % (2**32))
    n = int(rng.randint(0, 6))
    out: list[tuple[str, str]] = []
    for _ in range(n):
        j = int(rng.pareto(1.1) * 40.0) % _LINK_UNIVERSE
        dst = f"https://{_domain_of(seed, j)}/article-{j}"
        if rng.uniform() < 0.7:
            anchor = _ANCHOR_PHRASES[int(rng.randint(0, len(_ANCHOR_PHRASES)))]
        else:
            anchor = f"article {j}"
        out.append((dst, anchor))
    return out


def robots_body(host: str, seed: int = 42) -> str:
    """Deterministic robots.txt for ``host`` — shaped to exercise real RFC
    9309 semantics on the corpus's /article-N paths: a Disallow prefix, a
    LONGER Allow carve-out inside it (longest-match interplay), a non-*
    group that must be ignored, comments, and (for every 4th host) the
    empty-Disallow allow-all form."""
    h = stable_hash64(f"robots:{seed}:{host}")
    if h % 4 == 0:
        return "User-agent: *\nDisallow:\n"
    d = h % 10
    d2 = (h // 10) % 10
    return (
        f"# crawl policy for {host}\n"
        "User-agent: *\n"
        f"Disallow: /article-{d}\n"
        f"Allow: /article-{d}{d2}\n"
        "User-agent: evilbot\n"
        "Disallow: /\n"
    )


def write_robots(out_dir: str, seed: int = 42) -> str:
    """Write ``robots.parquet`` (host, body) for every corpus domain — the
    deterministic robots cache a compliant crawler consults before
    scheduling fetches."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    tbl = pa.table(
        {
            "host": pa.array(list(_DOMAINS), pa.string()),
            "body": pa.array([robots_body(d, seed) for d in _DOMAINS], pa.string()),
        }
    )
    path = os.path.join(out_dir, "robots.parquet")
    pq.write_table(tbl, path)
    return path


def generate_pages(
    n_pages: int, seed: int = 42, start_index: int = 0
) -> tuple[pa.Table, dict[str, pa.Table]]:
    """Generate ``n_pages`` pages (indices start_index..start_index+n_pages).

    Returns (pages_table, gold) with gold = {gold_text, gold_mentions,
    gold_triples, gold_entities}. Pure function of (seed, index range).
    """
    urls, tss, htmls, texts, langs = [], [], [], [], []
    g_m = {"url": [], "sent_id": [], "start": [], "end": [], "type": [], "surface": []}
    g_t = {"url": [], "sent_id": [], "subj": [], "pred": [], "obj": []}
    g_l = {"src_url": [], "dst_url": [], "anchor": []}

    for i in range(start_index, start_index + n_pages):
        rng = np.random.RandomState(stable_hash64(f"page:{seed}:{i}") % (2**32))
        dom = _DOMAINS[int(np.searchsorted(_DOMAIN_CDF, rng.uniform()))]
        url = f"https://{dom}/article-{i}"
        lang = "en" if rng.uniform() < 0.95 else "de"
        n_sent = int(rng.randint(3, 9))

        sent_texts: list[str] = []
        if lang == "de":
            for _ in range(n_sent):
                sent_texts.append(_DE_FILLER[int(rng.randint(0, len(_DE_FILLER)))])
        else:
            for s in range(n_sent):
                if rng.uniform() < 0.6:
                    tpl, spec = _REL_TEMPLATES[int(rng.randint(0, len(_REL_TEMPLATES)))]
                    tokens, mentions, triples = _fill_template(rng, tpl, spec)
                else:
                    tpl = _PLAIN_TEMPLATES[int(rng.randint(0, len(_PLAIN_TEMPLATES)))]
                    tokens, mentions, triples = _fill_template(rng, tpl, [])
                sent_texts.append(" ".join(tokens))
                for (typ, st, en, surf) in mentions:
                    g_m["url"].append(url)
                    g_m["sent_id"].append(s)
                    g_m["start"].append(st)
                    g_m["end"].append(en)
                    g_m["type"].append(typ)
                    g_m["surface"].append(surf)
                for (subj, pred, obj) in triples:
                    g_t["url"].append(url)
                    g_t["sent_id"].append(s)
                    g_t["subj"].append(subj)
                    g_t["pred"].append(pred)
                    g_t["obj"].append(obj)

        # group sentences into 1-3-sentence paragraphs (one <p> each); page
        # text = paragraphs joined by \n, sentences within a paragraph by " ".
        paragraphs: list[str] = []
        k = 0
        while k < len(sent_texts):
            take = int(rng.randint(1, 4))
            paragraphs.append(" ".join(sent_texts[k : k + take]))
            k += take
        text = "\n".join(paragraphs)

        urls.append(url)
        tss.append(_EPOCH_US + (stable_hash64(f"ts:{seed}:{i}") % (86_400_000_000 * 365)))
        links = _gen_links(seed, i)
        for dst, anchor in links:
            g_l["src_url"].append(url)
            g_l["dst_url"].append(dst)
            g_l["anchor"].append(anchor)
        htmls.append(_render_html(rng, paragraphs, f"Article {i}", links))
        texts.append(text)
        langs.append(lang)

    pages = pa.Table.from_arrays(
        [
            pa.array(urls, pa.string()),
            pa.array(tss, pa.timestamp("us")),
            pa.array(htmls, pa.binary()),
            pa.array(texts, pa.string()),
            pa.array(langs, pa.string()),
        ],
        schema=_PAGE_SCHEMA,
    )
    gold = {
        "gold_text": pa.table({"url": urls, "text": texts}),
        "gold_mentions": pa.table(
            {
                "url": g_m["url"],
                "sent_id": pa.array(g_m["sent_id"], pa.int32()),
                "start": pa.array(g_m["start"], pa.int32()),
                "end": pa.array(g_m["end"], pa.int32()),
                "type": g_m["type"],
                "surface": g_m["surface"],
            }
        ),
        "gold_triples": pa.table(
            {
                "url": g_t["url"],
                "sent_id": pa.array(g_t["sent_id"], pa.int32()),
                "subj": g_t["subj"],
                "pred": g_t["pred"],
                "obj": g_t["obj"],
            }
        ),
        "gold_entities": _gold_entities_table(),
        "gold_links": pa.table(
            {
                "src_url": pa.array(g_l["src_url"], pa.string()),
                "dst_url": pa.array(g_l["dst_url"], pa.string()),
                "anchor": pa.array(g_l["anchor"], pa.string()),
            }
        ),
    }
    return pages, gold


def write_pages_jsonl(
    out_dir: str, n_pages: int, seed: int = 42, n_files: int = 8,
) -> str:
    """Write the same deterministic corpus as JSONL shards (WARC-ish wire
    format: one JSON object per page, ``html`` base64-encoded, ``warc_ts`` in
    epoch microseconds). Second source format for the engine — the reader
    below restores the exact Parquet-path schema, so every downstream stage
    is format-agnostic."""
    import base64
    import json
    import os

    os.makedirs(out_dir, exist_ok=True)
    per = (n_pages + n_files - 1) // n_files
    for f in range(n_files):
        lo = f * per
        cnt = max(0, min(per, n_pages - lo))
        if cnt == 0:
            break
        tbl, _ = generate_pages(cnt, seed=seed, start_index=lo)
        with open(os.path.join(out_dir, f"pages-{f:04d}.jsonl"), "w") as fh:
            for row in tbl.to_pylist():
                row["html"] = base64.b64encode(row["html"]).decode("ascii")
                row["warc_ts"] = int(row["warc_ts"].timestamp() * 1_000_000)
                fh.write(json.dumps(row, sort_keys=True) + "\n")
    return out_dir


def pages_dataset_jsonl(path: str, columns: list[str] | None = None):
    """Read JSONL pages shards into the exact schema of the Parquet path
    (url string, html binary, text string, lang string) so ``run_kg`` and
    every stage work unchanged. Base64 decode is vectorized per batch."""
    import base64
    import glob
    import os

    import ray.data

    cols = columns or ["url", "html", "text", "lang"]
    files = sorted(glob.glob(os.path.join(path, "pages-*.jsonl"))) or path
    ds = ray.data.read_json(files)

    def restore(t: pa.Table) -> pa.Table:
        out: dict[str, pa.Array] = {}
        for c in cols:
            if c == "html":
                raw = [base64.b64decode(v) for v in t.column("html").to_pylist()]
                out[c] = pa.array(raw, pa.binary())
            elif c == "warc_ts":
                out[c] = pa.array(
                    t.column("warc_ts").to_pylist(), pa.timestamp("us")
                )
            else:
                out[c] = t.column(c)
        return pa.table(out)

    return ds.map_batches(restore, batch_format="pyarrow")


def _gold_entities_table() -> pa.Table:
    alias_map = {}
    for group in ALIAS_GROUPS:
        norms = sorted(normalize_surface(s) for s in group)
        for s in group:
            alias_map[s] = norms[0]
    surfaces, canon = [], []
    for typ, items in GAZETTEER.items():
        for s in items:
            n = alias_map.get(s, normalize_surface(s))
            surfaces.append(s)
            canon.append(stable_id(f"{typ}:{n}", prefix="e_"))
    return pa.table({"surface": surfaces, "canonical": canon})


def write_pages(
    out_dir: str, n_pages: int, seed: int = 42, n_files: int = 8,
    write_gold: bool = True,
) -> str:
    """Write pages as ``n_files`` Parquet shards + gold tables; returns dir.

    Sharding by contiguous index range keeps generation embarrassingly
    parallel-safe and gives read_parquet multiple input blocks.
    """
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    per = (n_pages + n_files - 1) // n_files
    golds: list[dict[str, pa.Table]] = []
    for f in range(n_files):
        lo = f * per
        cnt = max(0, min(per, n_pages - lo))
        if cnt == 0:
            break
        tbl, gold = generate_pages(cnt, seed=seed, start_index=lo)
        pq.write_table(tbl, os.path.join(out_dir, f"pages-{f:04d}.parquet"))
        golds.append(gold)
    if write_gold:
        for name in ("gold_text", "gold_mentions", "gold_triples", "gold_links"):
            merged = pa.concat_tables([g[name] for g in golds])
            pq.write_table(merged, os.path.join(out_dir, f"{name}.parquet"))
        pq.write_table(golds[0]["gold_entities"], os.path.join(out_dir, "gold_entities.parquet"))
    return out_dir
