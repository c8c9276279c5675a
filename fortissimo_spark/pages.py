"""Deterministic synthetic `pages` table generator (FIXTURES.md §1).

Derives a Common-Crawl-style page per `documents` row: the document text is
wrapped in a boilerplate page template (nav/header/footer/aside link farms,
inline script/style) whose main content is exactly the document's paragraphs
in ``<main><p>…</p></main>``. By construction:

* ``extract(strip='density')`` recovers ``documents.text`` byte-for-byte —
  this is the end-to-end oracle the driver checks via DuckDB.
* Hosts follow a skewed (Zipf-flavored) distribution so one host dominates —
  exercises salting.
* A deterministic slice of pages re-encodes as ISO-8859-1 / UTF-16 with a
  matching ``<meta charset>`` (or a byte-order pattern) — exercises the
  encoding-detection / re-decode path.
* A deterministic slice entity-encodes characters of the body text
  (``&#32;`` for spaces) — exercises character-reference decoding on the
  oracle-checked path.

Everything is a pure function of (doc_id, text, lang); no RNG state.
"""

from __future__ import annotations

import datetime as _dt

__all__ = ["HOSTS", "page_for_doc", "html_for_doc", "host_for_doc", "url_for_doc"]

# host 0 takes ~45% of traffic (skew target for salting); tail decays
HOSTS = (
    "megaportal.example.com", "news.example.org", "blog.example.net",
    "shop.example.io", "wiki.example.edu", "forum.example.co",
    "docs.example.dev", "mail.example.me", "photos.example.tv",
    "videos.example.cc", "maps.example.gg", "social.example.app",
    "code.example.sh", "data.example.ai", "cloud.example.xyz",
    "games.example.fun",
)
# cumulative permille thresholds for the 16 hosts (sums to 1000)
_HOST_CUM = (450, 590, 680, 750, 805, 850, 885, 912, 933, 950, 963, 974, 983, 990, 996, 1000)

_EPOCH = _dt.datetime(2025, 3, 1, tzinfo=_dt.timezone.utc)
_WINDOW_SECONDS = 14 * 86400


def _mix(doc_id: int, salt: int = 0) -> int:
    """Deterministic 64-bit hash of (doc_id, salt)."""
    x = (doc_id * 0x9E3779B97F4A7C15 + salt * 0xBF58476D1CE4E5B9 + 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    x ^= x >> 30
    x = (x * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x ^= x >> 27
    x = (x * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    x ^= x >> 31
    return x


def host_for_doc(doc_id: int) -> str:
    r = _mix(doc_id, 1) % 1000
    for i, cum in enumerate(_HOST_CUM):
        if r < cum:
            return HOSTS[i]
    return HOSTS[-1]


def url_for_doc(doc_id: int) -> str:
    return f"https://{host_for_doc(doc_id)}/article/{doc_id:010d}"


def warc_ts_for_doc(doc_id: int, crawl: int = 0) -> _dt.datetime:
    offset = _mix(doc_id, 2 + crawl) % _WINDOW_SECONDS
    return _EPOCH + _dt.timedelta(seconds=offset)


_MINIMAL = {"&": "&amp;", "<": "&lt;", ">": "&gt;"}


def _escape(s: str) -> str:
    if "&" in s or "<" in s or ">" in s:
        for ch, ent in _MINIMAL.items():
            s = s.replace(ch, ent)
    return s


def _nav_links(doc_id: int, count: int = 8) -> str:
    items = []
    for j in range(count):
        target = _mix(doc_id, 100 + j) % 100000
        items.append(f'<li><a href="/article/{target:010d}">related item {target}</a></li>')
    return "\n      ".join(items)


def html_for_doc(doc_id: int, text: str, lang: str | None) -> str:
    """Page template; ``extract(strip='density')`` yields exactly ``text``."""
    paragraphs = text.split("\n\n")
    body = []
    for p_i, para in enumerate(paragraphs):
        escaped = _escape(para)
        if doc_id % 5 == 0:
            # entity-decode exercise: first space becomes a numeric reference
            escaped = escaped.replace(" ", "&#32;", 1).replace(" ", "&#x20;", 1)
        body.append(f"<p>{escaped}</p>")
    main = "\n    ".join(body)
    lang_attr = f' lang="{lang}"' if lang else ""
    title = _escape(text[:40]) or "untitled"
    # torture garnish in DROPPED regions only (keeps the density oracle exact)
    garnish = ""
    if doc_id % 11 == 3:
        garnish = "<aside><p>score &ampruns &lt &#77,&#88; ·↵· Mañana</p></aside>"
    elif doc_id % 11 == 7:
        garnish = ("<aside><table><caption>A Table<th>x<tbody><tr><td>1<td>2"
                   "</table></aside>")
    # meta-robots slices (SQL-recomputable: pure doc_id % 17; case /
    # whitespace / "none" shorthand exercise the forgiving parse path)
    r = doc_id % 17
    robots = ""
    if r == 3:
        robots = '\n  <meta name="robots" content="noindex, nofollow">'
    elif r == 5:
        robots = '\n  <meta name="ROBOTS" content=" NONE ">'
    elif r == 7:
        robots = '\n  <meta name="googlebot" content="nofollow">'
    elif r == 9:
        robots = '\n  <meta name="robots" content="index, follow">'
    # page-metadata slices (SQL-recomputable: pure doc_id % 19)
    m = doc_id % 19
    if m == 4:
        robots += f'\n  <link rel="canonical" href="/article/{doc_id:010d}">'
    elif m == 6:
        robots += (f'\n  <meta name="description" '
                   f'content="Article {doc_id % 1000} summary">')
    elif m == 8:
        robots += (f'\n  <meta property="og:title" '
                   f'content="Portal {doc_id % 97}">')
    return f"""<!DOCTYPE html>
<html{lang_attr}>
<head>
  <meta charset="utf-8">{robots}
  <title>{title}</title>
  <style>
    body {{ margin: 0; font: 16px/1.4 sans-serif; }}
    nav a {{ color: #06c; }}
  </style>
  <script>
    window.pageId = {doc_id}; // '</div> not a tag <script>'
  </script>
</head>
<body>
  <header>
    <h1>Portal {doc_id % 97}</h1>
    <nav>
      <ul>
      {_nav_links(doc_id, 6)}
      </ul>
    </nav>
  </header>
  <main>
    {main}
  </main>
  {garnish}
  <aside>
    <ul>
      {_nav_links(doc_id + 7919, 5)}
    </ul>
  </aside>
  <footer>
    <p>© example {2020 + doc_id % 6} · <a href="/about">about</a> ·
    <a href="/privacy">privacy</a></p>
  </footer>
</body>
</html>
"""


def encode_page(doc_id: int, html: str) -> tuple[bytes, str]:
    """Encode the page, sometimes in a non-UTF-8 charset (deterministic)."""
    m = _mix(doc_id, 3) % 101
    if m == 17:
        body = html.replace('charset="utf-8"', 'charset="ISO-8859-1"')
        try:
            return body.encode("iso-8859-1"), "iso-8859-1"
        except UnicodeEncodeError:
            return html.encode("utf-8"), "utf-8"
    if m == 41:
        return b"\xff\xfe" + html.encode("utf-16-le"), "utf-16-le"
    if m == 73:
        return b"\xfe\xff" + html.encode("utf-16-be"), "utf-16-be"
    return html.encode("utf-8"), "utf-8"


def page_for_doc(doc_id: int, text: str, lang: str | None, crawl: int = 0) -> dict:
    html = html_for_doc(doc_id, text, lang)
    raw, encoding = encode_page(doc_id, html)
    return {
        "url": url_for_doc(doc_id),
        "warc_ts": warc_ts_for_doc(doc_id, crawl),
        "html": raw,
        "text": None,
        "lang": lang,
        "encoding": encoding,
    }


def has_second_crawl(doc_id: int) -> bool:
    """~10% of urls are crawled twice (dedup-window exercise)."""
    return _mix(doc_id, 4) % 10 == 0
