"""wechat dialect — the hairiest reference parser, re-derived from
/root/reference/news_crawler/wechat_news/wechat_news.py:

  _js_decode escapes            :66-85
  cgiDataNew SSR blob           :88-135  (JsDecode('…') substitution,
                                          '123' * 1 coercion, lenient JS)
  legacy __QMTPL_SSR_DATA__     :138-165
  SSR picture list              :168-195 (cdn_url regex, \\x26amp; fix)
  recursive DOM walk            :258-427 (section/div recursion, heading,
                                          ul/ol numbering, media, p/span/a
                                          compensation for nested media)
  first-wins dedup              :236-256
  meta (ssr + legacy)           :511-560
  title (ssr title | #activity-name), validate title  :562-587

The reference leans on demjson3 for lenient JS-object parsing; this
container lacks it, so _lenient_js_loads quotes bare keys / converts
single-quoted strings before json.loads — sufficient for the cgiDataNew
shape the reference handles.
"""

from __future__ import annotations

import datetime as _dt
import json
import re

from .html_dom import Node, parse_html
from .platforms import IMAGE, TEXT, VIDEO, _span, first_wins_dedup


def _js_decode(s: str) -> str:
    if not s:
        return s
    return (
        s.replace("\\x5c", "\\")
        .replace("\\x0d", "\r")
        .replace("\\x22", '"')
        .replace("\\x26", "&")
        .replace("\\x27", "'")
        .replace("\\x3c", "<")
        .replace("\\x3e", ">")
        .replace("\\x0a", "\n")
    )


def _lenient_js_loads(js: str):
    """demjson3 stand-in: JSON first, then quote bare keys + single-quoted
    strings, strip trailing commas."""
    try:
        return json.loads(js)
    except ValueError:
        pass
    fixed = js.replace(" * 1", "")
    # single-quoted strings -> double-quoted (no embedded double quotes case)
    fixed = re.sub(r"'((?:[^'\\]|\\.)*)'", lambda m: json.dumps(_unescape_sq(m.group(1)), ensure_ascii=False), fixed)
    # bare keys -> quoted
    fixed = re.sub(r"([{,]\s*)([A-Za-z_][A-Za-z0-9_]*)\s*:", r'\1"\2":', fixed)
    # trailing commas
    fixed = re.sub(r",(\s*[}\]])", r"\1", fixed)
    return json.loads(fixed)


def _unescape_sq(s: str) -> str:
    return s.replace("\\'", "'").replace("\\\\", "\\")


_CGI_PATTERN = re.compile(r"window\.cgiDataNew\s*=\s*({[\s\S]*?});[\s\n]*}\s*catch")
_JSDECODE = re.compile(r"JsDecode\('((?:[^'\\]|\\.)*)'\)")
_LEGACY_SSR = re.compile(r"window\.__QMTPL_SSR_DATA__=(.+);</script>")
_PIC_LIST = re.compile(
    r"window\.picture_page_info_list = (\[[\s\S]*?\])\.slice\(0,\s*20\);", re.DOTALL
)
_CREATE_TIME = re.compile(r"var createTime = '(\d{4}-\d{2}-\d{2} \d{2}:\d{2})';")


def _parse_cgi_data_new(html: str) -> dict | None:
    if "window.cgiDataNew" not in html:
        return None
    m = _CGI_PATTERN.search(html)
    if not m:
        return None
    try:
        js = m.group(1)

        def repl(mo: re.Match) -> str:
            decoded = _js_decode(_unescape_sq(mo.group(1)))
            return json.dumps(decoded, ensure_ascii=False)

        js = _JSDECODE.sub(repl, js)
        js = re.sub(r"'(\d+)'\s*\*\s*1", r"\1", js)
        out = _lenient_js_loads(js)
        return out if isinstance(out, dict) else None
    except (ValueError, TypeError):
        return None


def _parse_ssr_data(html: str) -> dict | None:
    cgi = _parse_cgi_data_new(html)
    if cgi:
        return cgi
    if "window.__QMTPL_SSR_DATA__" not in html:
        return None
    m = _LEGACY_SSR.search(html)
    if not m:
        return None
    try:
        out = _lenient_js_loads(m.group(1).strip())
        return out if isinstance(out, dict) else None
    except (ValueError, TypeError):
        return None


def _parse_ssr_image_list(html: str) -> list[tuple[str, str, str]]:
    m = _PIC_LIST.search(html)
    if not m:
        return []
    urls = re.findall(r"cdn_url:\s*'([^']+)'", m.group(1))
    return [_span(IMAGE, u.replace("\\x26amp;", "&")) for u in urls]


# ---------------------------------------------------------------------------
# DOM walk
# ---------------------------------------------------------------------------

class _Walker:
    def __init__(self) -> None:
        self.spans: list[tuple[str, str, str]] = []

    # media: img src|data-src; video/iframe src  (:258-277)
    @staticmethod
    def _media(node: Node) -> tuple[str, str, str] | None:
        if node.tag == "img":
            u = node.get("src") or node.get("data-src")
            if u:
                return _span(IMAGE, u)
        elif node.tag in ("video", "iframe"):
            u = node.get("src")
            if u:
                return _span(VIDEO, u)
        return None

    @staticmethod
    def _text_block(node: Node) -> str | None:
        if node.tag in ("script", "style"):
            return None
        text = node.string().strip()
        return text or None

    def _list_item(self, node: Node) -> str | None:
        text = self._text_block(node)
        if not text:
            return None
        # ancestor::ol check + preceding-sibling::li count (:300-320)
        anc = node.parent
        in_ol = False
        while anc is not None:
            if anc.tag == "ol":
                in_ol = True
                break
            anc = anc.parent
        if in_ol and node.parent is not None:
            sibs = [c for c in node.parent.children if c.tag == "li"]
            position = sibs.index(node) + 1
            return f"{position}. {text}"
        return f"• {text}"

    def walk(self, node: Node) -> None:
        tag = node.tag
        if tag in ("section", "div", "article", "blockquote"):
            # direct text first (first #text child, like xpath ./text() [1])
            direct = next((c.text for c in node.children if c.tag == "#text" and c.text), "")
            if direct.strip():
                self.spans.append(_span(TEXT, direct.strip()))
            for child in node.element_children():
                self.walk(child)
            return
        if tag in ("h1", "h2", "h3", "h4", "h5", "h6"):
            text = self._text_block(node)
            if text:
                self.spans.append(_span(TEXT, text))
            return
        if tag in ("ul", "ol"):
            for li in node.find_all("li"):
                item = self._list_item(li)
                if item:
                    self.spans.append(_span(TEXT, item))
            return
        if tag == "li":
            item = self._list_item(node)
            if item:
                self.spans.append(_span(TEXT, item))
            return
        media = self._media(node)
        if media:
            self.spans.append(media)
            return
        if tag == "p":
            for d in node.iter():
                if d is not node and d.tag in ("img", "video", "iframe"):
                    m = self._media(d)
                    if m:
                        self.spans.append(m)
            text = self._text_block(node)
            if text:
                self.spans.append(_span(TEXT, text))
            return
        if tag in ("span", "strong"):
            for d in node.iter():
                if d is not node and d.tag in ("img", "video", "iframe"):
                    m = self._media(d)
                    if m:
                        self.spans.append(m)
            text = self._text_block(node)
            if text:
                self.spans.append(_span(TEXT, text))
            return
        if tag == "a":
            for d in node.iter():
                if d is not node and d.tag == "img":
                    m = self._media(d)
                    if m:
                        self.spans.append(m)
            text = self._text_block(node)
            if text:
                self.spans.append(_span(TEXT, text))
            return


def _parse_ssr_content(html: str, ssr: dict | None) -> list[tuple[str, str, str]]:
    spans: list[tuple[str, str, str]] = []
    if ssr:
        pics = ssr.get("picture_page_info_list") or []
        for pic in pics:
            cdn = (pic.get("cdn_url", "") if isinstance(pic, dict) else "").replace("&amp;", "&")
            if cdn:
                spans.append(_span(IMAGE, cdn))
        if not pics:
            spans.extend(_parse_ssr_image_list(html))
        desc = ssr.get("desc") or ssr.get("content_noencode") or ssr.get("title")
        if desc:
            for line in str(desc).split("\n"):
                if line:
                    spans.append(_span(TEXT, line.strip()))
    return spans


def parse_wechat(html: str, url: str) -> dict:
    ssr = _parse_ssr_data(html)
    root = parse_html(html)
    if ssr:
        title = (ssr.get("title") or "").strip()
    else:
        h1 = root.find_by_id("activity-name")
        title = h1.string().strip() if h1 else ""
    if not title:
        raise ValueError("Failed to get title")

    # meta (:517-560)
    if ssr:
        author_name = (ssr.get("nick_name") or "").strip()
        publish_time = (ssr.get("create_time") or "").strip()
        if not publish_time:
            ost = ssr.get("ori_send_time")
            if ost:
                try:
                    publish_time = _dt.datetime.fromtimestamp(
                        int(ost), _dt.timezone.utc
                    ).strftime("%Y-%m-%d %H:%M")
                except (ValueError, TypeError):
                    publish_time = ""
    else:
        publish_time = ""
        m = _CREATE_TIME.search(html)
        if m:
            publish_time = m.group(1)
        prof = root.find_by_id("profileBt")
        wechat_name = prof.string().strip() if prof else ""
        meta_div = root.find_by_id("meta_content")
        author_url_text = ""
        if meta_div:
            for sp in meta_div.find_all("span"):
                cls = sp.classes()
                if "rich_media_meta" in cls and "rich_media_meta_text" in cls:
                    author_url_text = sp.string().strip()
                    break
        author_name = f"{wechat_name} - {author_url_text}".strip("- ")

    # contents: js_content DOM walk, else SSR content (:209-234)
    js_content = root.find_by_id("js_content")
    if js_content is not None:
        walker = _Walker()
        for child in js_content.element_children():
            walker.walk(child)
        spans = [s for s in walker.spans if (s[1] if s[0] == TEXT else s[2]).strip()]
        spans = first_wins_dedup(spans)
    else:
        spans = _parse_ssr_content(html, ssr)

    return {
        "title": title,
        "subtitle": None,
        "author_name": author_name.strip(),
        "author_url": "",
        "publish_time": publish_time.strip() if publish_time else "",
        "spans": spans,
    }
