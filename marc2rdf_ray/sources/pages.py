"""Deterministic synthetic Common-Crawl-style pages corpus.

The test/bench input table per BASELINE.json ``input_hint``:
``(url: string, warc_ts: timestamp[us], html: binary, text: string,
lang: string)``.  Generation is pure per-row (seeded by ``(seed, i)``), so it
parallelizes over Ray tasks with no coordination and reproduces identically
at any partitioning -- the analog of the reference's fixture corpus
(spec/example.normarc.xml) but scalable.

Corpus properties exercised downstream (FIXTURES.md §1):
- inverted "Last, First" author names incl. accented chars covering the
  CHAR_MAPPING table (string_replace.rb:19-52);
- a deliberately HOT author and HOT keyword (skew/salting tests);
- shared isbn-like identifiers across url clusters (sameAs key joins);
- exact-duplicate page bodies (dedup tests);
- relative hrefs (strict-URI literal fallback, rdfmodeler.rb:35-47);
- body text that mentions entity aliases (entity-linking stage input).

``text`` is derived with stages.extract.extract_text at generation time;
pytest verifies the pipeline reproduces it byte-identically per url.
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import random
from typing import Optional

import pyarrow as pa

from ..model import PAGES_SCHEMA
from ..stages.extract import extract_text

GEN_VERSION = 3  # bump when page content changes (bench cache key)

SITES = [
    "news.example.org", "blog.example.net", "books.example.no",
    "culture.example.com", "review.example.io", "arkiv.example.no",
]

# name pools: (catalogue "Last, First", given, lifespan, stable-id)
AUTHORS = [
    ("Hot, Harry", "Harry", "1970-", "10000001"),        # the hot entity
    ("Bache-Wiig, Anna", "Anna", "1975-", "32026400"),
    ("Åsen, Bjørn", "Bjørn", "1951-", "20000002"),
    ("Ægir, Þóra", "Þóra", "1980-", "20000003"),
    ("Ødegård, Sølvi", "Sølvi", "1968-", "20000004"),
    ("Nuñez, José", "José", "1955-2011", "20000005"),
    ("Çelik, Emel", "Emel", "1990-", "20000006"),
    ("Smith, Jane", "Jane", "1960-", "20000007"),
    ("Doe, John", "John", "1940-2020", "20000008"),
    ("Strøm, Kåre", "Kåre", "1977-", "20000009"),
]
ROLES = ["forf", "red", "overs", "foto", "medarb", "ill", "komp", "dir"]
KEYWORDS = [
    "oslo",  # the hot keyword
    "historie", "reise", "musikk", "politikk", "økonomi", "barnebøker",
    "krim", "poesi", "vitenskap", "fotball", "mat", "kunst", "teater",
]
LANGS = ["nob", "eng", "swe", "dan", "nno", "ger"]
ADJS = ["Silent", "Golden", "Lost", "Hidden", "Broken", "Bright", "Ancient",
        "Quiet", "Wild", "Frozen"]
NOUNS = ["River", "Mountain", "Library", "Garden", "Harbour", "Winter",
         "Letter", "Mirror", "Journey", "Song"]
PLACES = ["Oslo", "Bergen", "Tromsø", "Århus", "Reykjavík", "Göteborg",
          "Helsinki", "Торонто", "Zürich", "København"]
WORDS = ("the quick brown fox jumps over a lazy dog while rain falls softly "
         "on ancient rooftops and distant bells ring through narrow streets "
         "carrying echoes of forgotten seasons toward the silver harbour").split()


def _rng(seed: int, i: int) -> random.Random:
    h = hashlib.sha256(f"{seed}:{i}".encode()).digest()
    return random.Random(int.from_bytes(h[:8], "big"))


def _title(r: random.Random) -> tuple[str, str]:
    main = f"The {r.choice(ADJS)} {r.choice(NOUNS)} of {r.choice(PLACES)}"
    sub = f"{r.choice(ADJS)} {r.choice(NOUNS)}" if r.random() < 0.4 else ""
    return main, sub


def _paragraph(r: random.Random, mentions: list[str]) -> str:
    n = r.randint(30, 90)
    words = [r.choice(WORDS) for _ in range(n)]
    for m in mentions:
        words.insert(r.randrange(len(words) + 1), m)
    return " ".join(words)


def gen_page(i: int, seed: int = 42) -> dict:
    r = _rng(seed, i)
    site = SITES[i % len(SITES)]

    # ~5% exact-duplicate content of the previous page (dedup fixture)
    content_i = i - 1 if (i % 20 == 19 and i > 0) else i
    rc = _rng(seed, content_i) if content_i != i else r

    main, sub = _title(rc)
    # hot author on ~20% of pages (skew fixture)
    author = AUTHORS[0] if rc.random() < 0.20 else rc.choice(AUTHORS[1:])
    cat_name, given, lifespan, aid = author
    role = rc.choice(ROLES)
    n_kw = rc.randint(1, 4)
    kws = ["oslo"] if rc.random() < 0.30 else []
    kws += rc.sample(KEYWORDS[1:], n_kw)
    lang = LANGS[0] if rc.random() < 0.5 else rc.choice(LANGS)
    audience = "j" if rc.random() < 0.25 else "a"
    fmt = rc.choice("lgd")
    # isbn clusters: consecutive url pairs share one (sameAs fixture)
    isbn_base = (i // 2) if i % 7 < 2 else i
    isbn = f"978-82-{(seed * 131 + isbn_base) % 100000:05d}-{isbn_base % 10}"
    year = 1995 + (content_i * 7) % 30
    crawl_date = (_dt.date(2013, 1, 1) + _dt.timedelta(days=i % 720))
    warc_ts = _dt.datetime(
        crawl_date.year, crawl_date.month, crawl_date.day,
        i % 24, (i * 7) % 60, (i * 13) % 60,
    )
    display_name = f"{given} {cat_name.split(',')[0]}"
    mentions = [display_name] + [k.capitalize() for k in kws[:2]]
    # realistic Common-Crawl page body: tens of paragraphs (~15-40 KB of
    # markup), not a stub -- extraction cost per page must look like the
    # real workload's
    paras = [_paragraph(rc, mentions if p == 0 else [])
             for p in range(rc.randint(15, 35))]
    desc = f"{main}. {paras[0][:80]}"
    words = sum(len(p.split()) for p in paras)
    score = round(rc.random() * 5, 2)

    slug = main.lower().replace(" ", "-")
    url = f"https://{site}/articles/{slug}-{i}"
    prev_url = f"https://{site}/articles/prev-{max(0, i - 1)}"
    title_txt = f"{main} - {sub} | {site}" if sub else f"{main} | {site}"

    metas = [
        ("crawl_date", crawl_date.strftime("%y%m%d")),
        ("audience", audience),
        ("format", fmt),
        ("author", cat_name),
        ("author_given", given),
        ("author_lifespan", lifespan),
        ("author_role", role),
        ("author_id", aid),
        ("keywords", ", ".join(kws)),
        ("description", desc),
        ("isbn", isbn),
        ("published", str(year)),
        ("words", f"{words} w."),
        ("score", str(score)),
    ]
    meta_html = "\n".join(
        f'<meta name="{n}" content="{c}">' for n, c in metas
    )
    heads = "\n".join(f"<h2>{p.split('.')[0][:40]}</h2>" for p in paras[1:4])
    # realistic messy markup: nested divs, inline spans/links inside
    # paragraphs, comments, a table and a list section
    chunks = []
    for pi, p in enumerate(paras):
        words = p.split(" ")
        if pi % 3 == 1 and len(words) > 8:
            mid = len(words) // 2
            ref = f"https://{site}/tag/{words[0]}"
            p = (" ".join(words[:mid])
                 + f' <a href="{ref}">{words[mid]}</a> <em>'
                 + " ".join(words[mid + 1:]) + "</em>")
        chunks.append(f'<div class="para"><!-- p{pi} --><p>{p}</p></div>')
    body_paras = "\n".join(chunks)
    row_cells = "".join(
        f"<tr><td>{k}</td><td>{rc.randint(1, 999)}</td></tr>" for k in kws
    )
    table_html = f"<table><tr><th>tag</th><th>n</th></tr>{row_cells}</table>"
    list_html = "<ul>" + "".join(
        f'<li><a href="https://{site}/kw/{k}">{k.capitalize()}</a></li>'
        for k in kws
    ) + "</ul>"
    related = "\n".join(
        f'<a href="https://{SITES[(i + j) % len(SITES)]}/articles/rel-{(i * 7 + j) % 1000}">related {j}</a>'
        for j in range(rc.randint(3, 8))
    )
    html = f"""<!DOCTYPE html>
<html lang="{lang}">
<head>
<title>{title_txt}</title>
{meta_html}
<style>body {{ margin: 0; }} .para {{ padding: 2px; }}</style>
<script>var x = 1; function f() {{ return x + 1; }}</script>
</head>
<body>
<header><nav><a href="/about">About</a> <a href="{prev_url}">Previous</a></nav></header>
<h1>{main}</h1>
{heads}
{body_paras}
<section>{table_html}</section>
<section>{list_html}</section>
<aside>{related}</aside>
<footer>© {year} {site} — <a href=" see {url} ">self</a></footer>
</body>
</html>"""

    return {
        "url": url,
        "warc_ts": warc_ts,
        "html": html.encode("utf-8"),
        "text": extract_text(html),
        "lang": lang,
    }


def synthesize_pages(n: int, seed: int = 42, start: int = 0) -> pa.Table:
    rows = [gen_page(i, seed) for i in range(start, start + n)]
    return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)


def gen_pages_batch(batch, seed: int = 42) -> pa.Table:
    """Ray batch fn over ``ray.data.range(n)`` ids -> pages rows."""
    ids = batch["id"].to_pylist()
    return pa.Table.from_pylist([gen_page(i, seed) for i in ids],
                                schema=PAGES_SCHEMA)


def write_pages_dataset(
    out_dir: str,
    n: int,
    seed: int = 42,
    *,
    rows_per_file: int = 20000,
    override_num_blocks: Optional[int] = None,
) -> None:
    """Materialize a pages corpus with Ray (caller owns the Ray session)."""
    import ray.data as rd

    blocks = override_num_blocks or max(1, n // rows_per_file)
    ds = rd.range(n, override_num_blocks=blocks)
    ds = ds.map_batches(
        lambda b: gen_pages_batch(b, seed), batch_format="pyarrow"
    )
    ds.write_parquet(out_dir)
