"""Deterministic synthetic Common-Crawl-style pages (FIXTURES.md).

The analog of the reference's test fixtures: ``createTestImage`` (white canvas
+ 3 putText lines, ``tests/test_ocr_worker.cpp:70-83``), the real
``images/card-jd.jpg`` card, the empty ``cv::Mat`` and the 10×10
``small_image_`` (``tests/test_ocr_worker.cpp:33,235-260``). Everything is
keyed on ``(SEED, i)`` so any scale regenerates byte-identically in any
process — no external data, no wall clock.

Family mix by ``i % 20`` (FIXTURES.md): 12 realistic-card / 5 synthetic-simple
/ 1 empty / 1 tiny / 1 oversized.
"""

from __future__ import annotations

import datetime as dt
import random

import pandas as pd

SEED = 42
N_HOSTS = 97
EPOCH = dt.datetime(2025, 1, 1, 0, 0, 0)

_rng = random.Random(SEED)
_CONS = "bcdfghjklmnpqrstvwz"
_VOW = "aeiou"
WORDS = tuple(
    "".join(
        _rng.choice(_CONS) + _rng.choice(_VOW)
        for _ in range(_rng.randint(2, 4))
    )
    for _ in range(400)
) + (
    "the", "a", "of", "to", "in", "and", "is", "that", "for", "with",
    "was", "on", "as", "are", "this", "be", "it", "from", "at", "by",
)

_NAV_WORDS = (
    "HOME", "NEWS", "SPORTS", "POLITICS", "BUSINESS", "TECH", "CULTURE",
    "OPINION", "VIDEO", "LOCAL", "WORLD", "SCIENCE", "HEALTH", "TRAVEL",
)
_CTA_LINES = (
    "READ MORE | SUBSCRIBE NOW | FOLLOW US",
    "SHARE THIS | TWEET | PIN IT | EMAIL",
    "SIGN UP TODAY | FREE TRIAL | JOIN NOW",
    "TRENDING NOW | MOST READ | EDITOR PICKS",
)
_CJK = "数据处理引擎高效提取网页正文内容分布式计算"


def _sentence(r: random.Random, n: int) -> str:
    ws = [r.choice(WORDS) for _ in range(n)]
    ws[0] = ws[0].capitalize()
    return " ".join(ws) + "."


def _paragraph(r: random.Random, lang: str) -> str:
    n_sent = r.randint(2, 5)
    sents = [_sentence(r, r.randint(6, 16)) for _ in range(n_sent)]
    if lang == "zh" and r.random() < 0.5:
        k = r.randint(4, 12)
        a = r.randrange(0, len(_CJK) - 1)
        sents.append(_CJK[a : a + max(2, min(k, len(_CJK) - a))] + "。")
    text = " ".join(sents)
    # sprinkle rec-exercising noise: entities, double spaces, inline tags
    if r.random() < 0.3:
        text = text.replace(" ", "&nbsp;", 1)
    if r.random() < 0.3:
        text = text.replace(". ", ".  ", 1)
    if r.random() < 0.4:
        w = r.choice(WORDS)
        text += f" Costs {r.randint(3, 99)} &amp; {w} <b>more</b> today."
    return text


def _nav_bar(r: random.Random) -> str:
    items = r.sample(_NAV_WORDS, r.randint(5, 9))
    links = " | ".join(f'<a href="/{w.lower()}">{w}</a>' for w in items)
    return f'<nav class="topnav">{links}</nav>'


def _sidebar(r: random.Random) -> str:
    lis = "".join(
        f'<li><a href="/t/{w}">{w} {r.choice(WORDS)}</a></li>'
        for w in r.sample(WORDS, 6)
    )
    return f'<div class="sidebar widget"><ul>{lis}</ul></div>'


def _ad(r: random.Random) -> str:
    return (
        f'<div class="ad banner">BUY {r.choice(WORDS).upper()} NOW '
        f"| LIMITED OFFER | {r.randint(10, 90)}% OFF</div>"
    )


def _realistic_card(r: random.Random, i: int, lang: str) -> str:
    n_par = r.randint(5, 40)
    title = _sentence(r, r.randint(4, 8))[:-1]
    paras = []
    for p in range(n_par):
        paras.append(f"<p>{_paragraph(r, lang)}</p>")
        # the "upside-down block": boilerplate that mimics content (no link,
        # no hint ancestor) — only the cls stage can catch it (FIXTURES.md §2)
        if r.random() < 0.15:
            paras.append(f"<p>{r.choice(_CTA_LINES)}</p>")
    return (
        "<!DOCTYPE html><html><head><title>t</title>"
        "<style>p{margin:0}</style><script>var x=1;</script></head><body>"
        + _nav_bar(r)
        + f'<header class="site-header">{_ad(r)}</header>'
        + f"<main><article><h1>{title}</h1>"
        + "".join(paras)
        + "</article></main>"
        + _sidebar(r)
        + _ad(r)
        + f'<footer>© 2025 host{i % N_HOSTS} | '
        '<a href="/tos">Terms</a> | <a href="/priv">Privacy</a></footer>'
        "</body></html>"
    )


def _synthetic_simple(r: random.Random, lang: str) -> str:
    # analog of createTestImage: 3 clean content paragraphs, no boilerplate
    paras = "".join(f"<p>{_paragraph(r, lang)}</p>" for _ in range(3))
    return f"<html><body>{paras}</body></html>"


def _oversized(r: random.Random, i: int, oversize_max: int) -> str:
    sizes = [1, 2, 4, 8, 16]
    target = min(sizes[(i // 20) % len(sizes)] * 1_000_000, oversize_max)
    chunk = f"<p>{_paragraph(r, 'en')}</p>"
    reps = max(1, target // len(chunk))
    return f"<html><body>{chunk * reps}</body></html>"


_TAG_STRIP = __import__("re").compile(r"<[^>]*>")


def page(i: int, oversize_max: int = 16_000_000) -> dict:
    """Generate row ``i`` of the documents table (input_hint schema)."""
    r = random.Random((SEED << 32) ^ i)
    host = 0 if i % 5 == 0 else i % N_HOSTS  # 20% of rows on the mega-host
    url = f"https://host{host}.example/page/{i}"
    warc_ts = EPOCH + dt.timedelta(seconds=137 * i)
    lang = ("en", "zh", "de", "")[i % 4]
    b = i % 20
    if b < 12:
        html = _realistic_card(r, i, lang).encode("utf-8")
    elif b < 17:
        html = _synthetic_simple(r, lang).encode("utf-8")
    elif b == 17:
        html = (None, b"", b"\xff\xfe\x80garbage\x80\xff")[i % 3]
    elif b == 18:
        html = b"<html><body>ok</body></html>"
    else:
        html = _oversized(r, i, oversize_max).encode("utf-8")
    text = _TAG_STRIP.sub(" ", html.decode("utf-8", "ignore")) if html else ""
    return {
        "url": url,
        "warc_ts": warc_ts,
        "html": html,
        "text": text[:4000],
        "lang": lang,
    }


def build_documents_pdf(
    n: int, start: int = 0, oversize_max: int = 16_000_000
) -> pd.DataFrame:
    """Rows [start, start+n) as a pandas DataFrame (input_hint columns)."""
    return pd.DataFrame(
        [page(i, oversize_max) for i in range(start, start + n)],
        columns=["url", "warc_ts", "html", "text", "lang"],
    )
