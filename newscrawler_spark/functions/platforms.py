"""Per-platform HTML -> (title, meta, spans) extraction dialects.

Each dialect is a pure function ``(html: str, url: str) -> dict`` returning
  {"title": str, "author_name": str, "author_url": str,
   "publish_time": str, "spans": [(kind, text, media_ref)], "subtitle": str|None}
and raising ValueError on unparseable input (per-row isolation happens in
the dispatcher, extract.py).

Span order IS document order — the reference relies on Python list append
order (SURVEY.md W1); the explicit offset is assigned by the dispatcher.

Semantics are re-derived from the reference parsers (cited per dialect);
the implementation is new (stdlib html.parser DOM, see html_dom.py —
the reference uses parsel/lxml which this container lacks).
"""

from __future__ import annotations

import json
import re

from .html_dom import Node, parse_html

TEXT, IMAGE, VIDEO = "text", "image", "video"

ZERO_WIDTH = "​"


def _span(kind: str, content: str) -> tuple[str, str, str]:
    """text spans carry payload in `text`; media spans carry URL in
    `media_ref` (input_hint contract).  The reference stores both in
    `content` with `desc` mirroring it."""
    if kind == TEXT:
        return (TEXT, content, "")
    return (kind, "", content)


def first_wins_dedup(spans: list[tuple[str, str, str]]) -> list[tuple[str, str, str]]:
    """Order-preserving (kind, content) dedup — wechat_news.py:236-256
    (content key is text for text spans, media_ref for media spans)."""
    seen: set[tuple[str, str]] = set()
    out = []
    for kind, text, ref in spans:
        key = (kind, text if kind == TEXT else ref)
        if key not in seen:
            seen.add(key)
            out.append((kind, text, ref))
    return out


# ---------------------------------------------------------------------------
# toutiao — toutaio_news.py:70-145 (//h1 title; article-meta block;
# //article/* walk: p→text, img/div/p→images, video→video)
# ---------------------------------------------------------------------------

def parse_toutiao(html: str, url: str) -> dict:
    root = parse_html(html)
    h1 = root.find("h1")
    title = (h1.string().strip() if h1 else "") or ""
    if not title:
        raise ValueError("Failed to get title")

    publish_time = author_name = author_url = ""
    meta_div = root.find("div", cls="article-meta")
    if meta_div:
        span_children = [c for c in meta_div.element_children() if c.tag == "span"]
        if span_children:
            publish_time = span_children[0].string().strip()
        name_span = next((s for s in span_children if "name" in s.classes()), None)
        if name_span:
            a = name_span.find("a")
            if a:
                author_name = a.string().strip()
                href = a.get("href").strip()
                author_url = ("https://www.toutiao.com" + href) if href else ""

    spans: list[tuple[str, str, str]] = []
    article = root.find("article")
    if article:
        for el in article.element_children():
            if el.tag == "p":
                text = el.string().strip()
                if text:
                    spans.append(_span(TEXT, text))
            if el.tag in ("img", "div", "p"):
                if el.tag == "img":
                    src = el.get("src")
                    if src:
                        spans.append(_span(IMAGE, src))
                else:
                    for img in el.find_all("img"):
                        src = img.get("src")
                        if src:
                            spans.append(_span(IMAGE, src))
            if el.tag == "video":
                src = el.get("src")
                if src:
                    spans.append(_span(VIDEO, src))
    return {
        "title": title,
        "subtitle": None,
        "author_name": author_name,
        "author_url": author_url,
        "publish_time": publish_time,
        "spans": spans,
    }


# ---------------------------------------------------------------------------
# netease — netease_news.py:75-177 (h1.post_title; div.post_info for time/
# source; div.post_body walk: p→text+nested imgs, img, video)
# ---------------------------------------------------------------------------

def parse_netease(html: str, url: str) -> dict:
    root = parse_html(html)
    h1 = root.find("h1", cls="post_title")
    title = (h1.string().strip() if h1 else "")
    if not title:
        raise ValueError("Failed to get title")

    publish_time = author_name = ""
    info = root.find("div", cls="post_info")
    if info:
        info_text = info.string()
        m = re.search(r"(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2})", info_text)
        publish_time = m.group(1) if m else ""
        m2 = re.search(r"来源:\s*([^\s]+)", info_text)
        author_name = m2.group(1).strip() if m2 else ""

    spans: list[tuple[str, str, str]] = []
    body = root.find("div", cls="post_body")
    if body:
        for el in body.element_children():
            if el.tag == "p":
                text = el.string().strip()
                if text:
                    spans.append(_span(TEXT, text))
                for img in el.find_all("img"):
                    src = img.get("src")
                    if src:
                        spans.append(_span(IMAGE, src))
            elif el.tag == "img":
                src = el.get("src")
                if src:
                    spans.append(_span(IMAGE, src))
            elif el.tag == "video":
                src = el.get("src")
                if src:
                    spans.append(_span(VIDEO, src))
            elif el.tag == "div":
                for img in el.find_all("img"):
                    src = img.get("src")
                    if src:
                        spans.append(_span(IMAGE, src))
    return {
        "title": title,
        "subtitle": None,
        "author_name": author_name,
        "author_url": "",
        "publish_time": publish_time,
        "spans": spans,
    }


# ---------------------------------------------------------------------------
# sohu — sohu_news.py:76-246: positional image join (J1). Real image URLs
# live in a JS `imgsList: [...],` blob (strict JSON after trailing-comma
# repair, :132-161); the i-th img-bearing element of article#mp-editor
# takes the i-th list URL; text is suppressed for img-bearing paragraphs
# (:183-200); only '//'-URLs get a https: prefix.  (_is_valid_image_url
# at :81-97 is defined but never called in the reference — not applied.)
# ---------------------------------------------------------------------------

_SOHU_IMGSLIST = re.compile(r"imgsList:\s*(\[[\s\S]*?\])\s*,")


def _sohu_fix_scheme(u: str) -> str:
    if u.startswith("//"):
        return "https:" + u
    return u


def parse_sohu(html: str, url: str) -> dict:
    root = parse_html(html)
    h1 = root.find("h1")
    title = (h1.string().strip() if h1 else "")
    if not title:
        raise ValueError("Failed to get title")

    publish_time = author_name = author_url = ""
    t = root.find_by_id("news-time") or root.find("span", cls="time")
    if t:
        publish_time = t.string().strip()
    media_meta = next(
        (n for n in root.iter() if n.tag == "meta" and n.get("name") == "mediaid"), None
    )
    if media_meta:
        author_name = media_meta.get("content").strip()
    h4 = root.find("h4")
    h4a = h4.find("a") if h4 else None
    if not author_name and h4a:
        author_name = h4a.string().strip()
    if h4a:
        author_url = h4a.get("href")
        if author_url.startswith("//"):
            author_url = "https:" + author_url

    # imgsList blob: strict JSON after removing trailing commas (:146-156)
    imgs: list[str] = []
    m = _SOHU_IMGSLIST.search(html)
    if m:
        blob = re.sub(r",(\s*[}\]])", r"\1", m.group(1))
        try:
            parsed = json.loads(blob)
            imgs = [i.get("url", "") for i in parsed if isinstance(i, dict) and i.get("url")]
        except ValueError:
            pass

    spans: list[tuple[str, str, str]] = []
    body = root.find_by_id("mp-editor")
    image_index = 0
    if body:
        for el in body.element_children():
            if el.tag == "p":
                has_img = el.find("img") is not None
                if has_img and image_index < len(imgs):
                    spans.append(_span(IMAGE, _sohu_fix_scheme(imgs[image_index])))
                    image_index += 1
                text = el.string().strip()
                if text and not has_img:
                    spans.append(_span(TEXT, text))
            elif el.tag == "img":
                if image_index < len(imgs):
                    spans.append(_span(IMAGE, _sohu_fix_scheme(imgs[image_index])))
                    image_index += 1
            elif el.tag == "video":
                src = el.get("src")
                if not src:
                    source = el.find("source")
                    src = source.get("src") if source else ""
                if src:
                    spans.append(_span(VIDEO, _sohu_fix_scheme(src)))
    return {
        "title": title,
        "subtitle": None,
        "author_name": author_name,
        "author_url": author_url,
        "publish_time": publish_time,
        "spans": spans,
    }


# ---------------------------------------------------------------------------
# tencent — tencent_news.py:77-200: window.DATA = {...} JSON blob carries
# title/meta; body from div.content-article: p→text, img, video.
# ---------------------------------------------------------------------------

_TENCENT_DATA = re.compile(r"window\.DATA\s*=\s*({.*?})\s*[;\n]", re.DOTALL)


def parse_tencent(html: str, url: str) -> dict:
    title = author_name = author_url = publish_time = ""
    m = _TENCENT_DATA.search(html)
    if m:
        try:
            data = json.loads(m.group(1))
            title = str(data.get("title", "") or "")
            publish_time = str(data.get("pubtime", "") or "")
            author_name = str(data.get("media", "") or "")
        except ValueError:
            pass
    root = parse_html(html)
    if not title:
        h1 = root.find("h1")
        title = h1.string().strip() if h1 else ""
    if not title:
        raise ValueError("Failed to get title")

    spans: list[tuple[str, str, str]] = []
    body = root.find("div", cls="content-article")
    if body:
        for el in body.iter():
            if el.tag == "p" and "one-p" in el.classes():
                text = el.string().strip()
                if text:
                    spans.append(_span(TEXT, text))
            elif el.tag == "img":
                src = el.get("src") or el.get("data-src")
                if src:
                    spans.append(_span(IMAGE, _sohu_fix_scheme(src)))
            elif el.tag == "video":
                src = el.get("src")
                if src:
                    spans.append(_span(VIDEO, src))
    if not spans and body:
        for el in body.element_children():
            if el.tag == "p":
                text = el.string().strip()
                if text:
                    spans.append(_span(TEXT, text))
    return {
        "title": title,
        "subtitle": None,
        "author_name": author_name,
        "author_url": author_url,
        "publish_time": publish_time,
        "spans": spans,
    }


# ---------------------------------------------------------------------------
# bbc — bbc_news.py:76-227: h1 title; time[datetime] ISO publish time;
# article walk: div[data-component='text-block'] p→text,
# figure→first non-placeholder img (grey-placeholder.png filtered, :133-149),
# '//'-srcs fixed to https.
# ---------------------------------------------------------------------------

def parse_bbc(html: str, url: str) -> dict:
    root = parse_html(html)
    h1 = root.find("h1")
    title = (h1.string().strip() if h1 else "")
    if not title:
        raise ValueError("Failed to get title")

    publish_time = ""
    t = root.find("time")
    if t:
        publish_time = t.get("datetime") or t.string().strip()
    author_name = ""
    byline = root.find("div", cls="byline")
    if byline:
        author_name = byline.string().strip()

    spans: list[tuple[str, str, str]] = []
    article = root.find("article")
    if article:
        for el in article.element_children():
            comp = el.get("data-component")
            if comp == "text-block":
                for p in el.find_all("p"):
                    text = p.string().strip()
                    if text:
                        spans.append(_span(TEXT, text))
            elif comp in ("image-block", "") or el.tag == "figure":
                figures = [el] if el.tag == "figure" else el.find_all("figure")
                for fig in figures:
                    srcs = [img.get("src") for img in fig.find_all("img")]
                    real = [s for s in srcs if s and not s.endswith("grey-placeholder.png")]
                    if real:
                        src = real[0]
                        if src.startswith("//"):
                            src = "https:" + src
                        spans.append(_span(IMAGE, src))
            elif comp == "video-block":
                for v in el.find_all("video"):
                    src = v.get("src")
                    if src:
                        spans.append(_span(VIDEO, src))
    return {
        "title": title,
        "subtitle": None,
        "author_name": author_name,
        "author_url": "",
        "publish_time": publish_time,
        "spans": spans,
    }


# ---------------------------------------------------------------------------
# cnn — cnn_news.py:77-202: h1 title; 'By ' prefix stripped from byline
# (:105-107); main content p.paragraph→text, picture img→image,
# video→video; '/'-relative srcs fixed to https://edition.cnn.com.
# ---------------------------------------------------------------------------

def parse_cnn(html: str, url: str) -> dict:
    root = parse_html(html)
    h1 = root.find("h1")
    title = (h1.string().strip() if h1 else "")
    if not title:
        raise ValueError("Failed to get title")

    author_name = ""
    byline = root.find("div", cls="byline__names") or root.find("span", cls="byline__name")
    if byline:
        author_name = byline.string().strip()
        if author_name.startswith("By "):
            author_name = author_name[3:]
    publish_time = ""
    ts = root.find("div", cls="timestamp")
    if ts:
        publish_time = ts.string().strip()

    spans: list[tuple[str, str, str]] = []
    main = root.find("main") or root.find("article") or root
    for el in main.iter():
        if el.tag == "p" and "paragraph" in el.classes():
            text = el.string().strip()
            if text:
                spans.append(_span(TEXT, text))
        elif el.tag == "picture":
            img = el.find("img")
            if img:
                src = img.get("src")
                if src:
                    if src.startswith("//"):
                        src = "https:" + src
                    elif src.startswith("/"):
                        src = "https://edition.cnn.com" + src
                    spans.append(_span(IMAGE, src))
        elif el.tag == "video":
            src = el.get("src")
            if src:
                spans.append(_span(VIDEO, src))
    return {
        "title": title,
        "subtitle": None,
        "author_name": author_name,
        "author_url": "",
        "publish_time": publish_time,
        "spans": spans,
    }


# ---------------------------------------------------------------------------
# detik — detik_news.py:72-180: cover media emitted BEFORE body (W4,
# :96-130); h1.detail__title; div.detail__body-text walk p/img/video.
# ---------------------------------------------------------------------------

def parse_detik(html: str, url: str) -> dict:
    root = parse_html(html)
    h1 = root.find("h1", cls="detail__title") or root.find("h1")
    title = (h1.string().strip() if h1 else "")
    if not title:
        raise ValueError("Failed to get title")

    author_name = publish_time = ""
    author_div = root.find("div", cls="detail__author")
    if author_div:
        author_name = author_div.string().strip()
    date_div = root.find("div", cls="detail__date")
    if date_div:
        publish_time = date_div.string().strip()

    spans: list[tuple[str, str, str]] = []
    # cover first (detik_news.py:96-130)
    cover = root.find("div", cls="detail__media")
    if cover:
        img = cover.find("img")
        if img and img.get("src"):
            spans.append(_span(IMAGE, img.get("src")))
        vid = cover.find("video")
        if vid and vid.get("src"):
            spans.append(_span(VIDEO, vid.get("src")))
    body = root.find("div", cls="detail__body-text")
    if body:
        for el in body.element_children():
            if el.tag == "p":
                text = el.string().strip()
                if text:
                    spans.append(_span(TEXT, text))
            elif el.tag == "img":
                src = el.get("src")
                if src:
                    spans.append(_span(IMAGE, src))
            elif el.tag == "video":
                src = el.get("src")
                if src:
                    spans.append(_span(VIDEO, src))
    return {
        "title": title,
        "subtitle": None,
        "author_name": author_name,
        "author_url": "",
        "publish_time": publish_time,
        "spans": spans,
    }


# ---------------------------------------------------------------------------
# naver — naver_news.py:42-171: div.se-main-container walk; zero-width
# chars stripped (:93); list numbering '{i}. ' / '• ' (:95-103);
# first-wins dedup applied (:59).
# ---------------------------------------------------------------------------

def parse_naver(html: str, url: str) -> dict:
    root = parse_html(html)
    title_el = root.find("div", cls="se-title-text") or root.find("h3", cls="se_textarea")
    title = (title_el.string().strip() if title_el else "")
    if not title:
        raise ValueError("Failed to get title")

    author_name = publish_time = ""
    nick = root.find("span", cls="nick")
    if nick:
        author_name = nick.string().strip()
    date_el = root.find("span", cls="se_publishDate")
    if date_el:
        publish_time = date_el.string().strip()

    spans: list[tuple[str, str, str]] = []
    container = root.find("div", cls="se-main-container")
    if container:
        for comp in container.element_children():
            _naver_component(comp, spans)
    spans = first_wins_dedup(spans)
    return {
        "title": title,
        "subtitle": None,
        "author_name": author_name,
        "author_url": "",
        "publish_time": publish_time,
        "spans": spans,
    }


def _naver_component(comp: Node, spans: list) -> None:
    classes = comp.classes()
    if "se-component" not in classes and comp.tag != "div":
        return
    if "se-text" in classes or comp.find("p", cls="se-text-paragraph"):
        for p in comp.find_all("p", cls="se-text-paragraph"):
            text = p.string().replace(ZERO_WIDTH, "").strip()
            if text:
                spans.append(_span(TEXT, text))
    if "se-image" in classes or comp.find("img"):
        for img in comp.find_all("img"):
            src = img.get("data-lazy-src") or img.get("src")
            if src:
                spans.append(_span(IMAGE, src))
    if "se-oglink" in classes:
        return
    for ul in comp.find_all("ul"):
        for li in ul.find_all("li"):
            text = li.string().replace(ZERO_WIDTH, "").strip()
            if text:
                spans.append(_span(TEXT, f"• {text}"))
    for ol in comp.find_all("ol"):
        for i, li in enumerate(ol.find_all("li"), start=1):
            text = li.string().replace(ZERO_WIDTH, "").strip()
            if text:
                spans.append(_span(TEXT, f"{i}. {text}"))


# ---------------------------------------------------------------------------
# lenny — lennysnewsletter.py:30-258: div.available-content walk;
# zero-width stripped (:128); list numbering (:130-150); first-wins dedup.
# ---------------------------------------------------------------------------

def parse_lenny(html: str, url: str) -> dict:
    root = parse_html(html)
    h1 = root.find("h1", cls="post-title") or root.find("h1")
    title = (h1.string().strip() if h1 else "")
    if not title:
        raise ValueError("Failed to get title")
    sub = root.find("h3", cls="subtitle")
    subtitle = sub.string().strip() if sub else None

    spans: list[tuple[str, str, str]] = []
    body = root.find("div", cls="available-content")
    if body:
        _lenny_walk(body, spans)
    spans = first_wins_dedup(spans)
    return {
        "title": title,
        "subtitle": subtitle,
        "author_name": "Lenny Rachitsky",
        "author_url": "https://www.lennysnewsletter.com",
        "publish_time": "",
        "spans": spans,
    }


def _lenny_walk(node: Node, spans: list) -> None:
    for el in node.element_children():
        if el.tag == "p":
            text = el.string().replace(ZERO_WIDTH, "").strip()
            if text:
                spans.append(_span(TEXT, text))
        elif el.tag in ("h2", "h3", "h4"):
            text = el.string().strip()
            if text:
                spans.append(_span(TEXT, text))
        elif el.tag == "ul":
            for li in [c for c in el.element_children() if c.tag == "li"]:
                text = li.string().replace(ZERO_WIDTH, "").strip()
                if text:
                    spans.append(_span(TEXT, f"• {text}"))
        elif el.tag == "ol":
            pos = 0
            for li in [c for c in el.element_children() if c.tag == "li"]:
                pos += 1
                text = li.string().replace(ZERO_WIDTH, "").strip()
                if text:
                    spans.append(_span(TEXT, f"{pos}. {text}"))
        elif el.tag == "img":
            src = el.get("src")
            if src:
                spans.append(_span(IMAGE, src))
        elif el.tag == "figure":
            img = el.find("img")
            if img and img.get("src"):
                spans.append(_span(IMAGE, img.get("src")))
        else:
            _lenny_walk(el, spans)


# ---------------------------------------------------------------------------
# quora — quora_answer.py:25-178: answer JSON double-encoded inside
# push("{\"data\":{\"answer\":...}}") (:68-84); sections[].spans[] walk
# (:115-156); unix-µs creationTime → '%Y-%m-%d %H:%M:%S' (:33-39).
# ---------------------------------------------------------------------------

_QUORA_PUSH = re.compile(r'push\(("{\\"data\\":{\\"answer\\":.*?}}")\);', re.DOTALL)


def _quora_ts(us: int) -> str:
    import datetime as _dt

    return _dt.datetime.fromtimestamp(us / 1_000_000, _dt.timezone.utc).strftime(
        "%Y-%m-%d %H:%M:%S"
    )


def parse_quora(html: str, url: str) -> dict:
    answer = None
    for m in _QUORA_PUSH.finditer(html):
        try:
            outer = json.loads(m.group(1))      # first decode: the quoted blob
            data = json.loads(outer) if isinstance(outer, str) else outer
            cand = data.get("data", {}).get("answer")
            if cand:
                answer = cand
                break
        except (ValueError, AttributeError):
            continue
    if answer is None:
        raise ValueError("Failed to locate answer JSON")

    title = ""
    q = answer.get("question") or {}
    qtext = q.get("title")
    if qtext:
        try:
            tdoc = json.loads(qtext) if isinstance(qtext, str) else qtext
            title = _quora_plain(tdoc)
        except ValueError:
            title = str(qtext)
    author = answer.get("author") or {}
    names = author.get("names") or []
    author_name = ""
    if names:
        nm = names[0]
        author_name = " ".join(
            x for x in (nm.get("givenName", ""), nm.get("familyName", "")) if x
        )
    publish_time = ""
    ct = answer.get("creationTime")
    if ct:
        publish_time = _quora_ts(int(ct))

    spans: list[tuple[str, str, str]] = []
    content = answer.get("content")
    if content:
        cdoc = json.loads(content) if isinstance(content, str) else content
        for section in cdoc.get("sections", []):
            stype = section.get("type", "")
            texts = []
            for sp in section.get("spans", []):
                t = sp.get("text", "")
                if t:
                    texts.append(t)
                modifiers = sp.get("modifiers") or {}
                emb = modifiers.get("embed") or {}
                if "image" in stype or modifiers.get("image"):
                    img_u = (modifiers.get("image") or {}).get("url") if isinstance(
                        modifiers.get("image"), dict
                    ) else modifiers.get("image")
                    if img_u:
                        spans.append(_span(IMAGE, img_u))
                if emb.get("url"):
                    spans.append(_span(VIDEO, emb["url"]))
            joined = "".join(texts).strip()
            if joined:
                spans.append(_span(TEXT, joined))
    return {
        "title": title,
        "subtitle": None,
        "author_name": author_name,
        "author_url": "",
        "publish_time": publish_time,
        "spans": spans,
    }


def _quora_plain(doc) -> str:
    if isinstance(doc, dict):
        parts = []
        for section in doc.get("sections", []):
            for sp in section.get("spans", []):
                parts.append(sp.get("text", ""))
        return "".join(parts).strip()
    return str(doc)
