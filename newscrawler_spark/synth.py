"""Deterministic synthetic web — frontier seeds, pages (URL -> HTML +
out-links), budgets, robots.  Everything is a pure function of (seed, id)
computed JVM-side with Column expressions over ``spark.range(n)`` — no
driver-side materialization, so the same generator describes a 10^10-URL
frontier on a cluster and a 10^3-URL one in tests.

Shape choices mirror FIXTURES.md §2-§6:
  * Zipf-ish domain skew — a few mega-hosts plus a long tail, so the
    skew-salting path is actually exercised;
  * ~10% exact-duplicate URLs and ~5% duplicates-after-canonicalization
    (query-string noise, e.g. toutiao's ?log_from=… — toutaio_news.py:58);
  * per-platform HTML matching each reference parser's selectors;
  * out-links that include already-seen URLs (anti-join test) and
    deeper article URLs (frontier-expansion test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import schema
from .canonical import PLATFORMS

# Platform -> (domain, url template).  {id} is the numeric article id.
URL_SHAPES: dict[str, tuple[str, str]] = {
    "toutiao": ("www.toutiao.com", "https://www.toutiao.com/article/74{id}/"),
    "wechat": ("mp.weixin.qq.com", "https://mp.weixin.qq.com/s/SSg{id}abc"),
    "netease": ("www.163.com", "https://www.163.com/news/article/KC{id}FH.html"),
    "sohu": ("www.sohu.com", "https://www.sohu.com/a/94{id}_160447"),
    "tencent": ("news.qq.com", "https://news.qq.com/rain/a/2025{id}A07W"),
    "detik": ("news.detik.com", "https://news.detik.com/internasional/d-{id}/synthetic-slug"),
    "naver": ("blog.naver.com", "https://blog.naver.com/newsroom/22{id}"),
    "lenny": ("www.lennysnewsletter.com", "https://www.lennysnewsletter.com/p/post-{id}"),
    "quora": ("www.quora.com", "https://www.quora.com/What-is-X/answer/Someone-{id}"),
    "bbc": ("www.bbc.com", "https://www.bbc.com/news/articles/c{id}o"),
    "cnn": ("edition.cnn.com", "https://edition.cnn.com/2025/10/27/world/story-{id}"),
}

# Zipf-ish platform weights out of 100 (first few dominate → skew).
PLATFORM_WEIGHTS = [30, 20, 13, 10, 8, 6, 4, 4, 2, 2, 1]
assert sum(PLATFORM_WEIGHTS) == 100 and len(PLATFORM_WEIGHTS) == len(PLATFORMS)

_CUM = [sum(PLATFORM_WEIGHTS[: i + 1]) for i in range(len(PLATFORM_WEIGHTS))]


def _platform_expr(slot: F.Column) -> F.Column:
    """slot in [0,100) -> platform name by cumulative weight."""
    expr = None
    for platform, hi in zip(PLATFORMS, _CUM):
        cond = slot < hi
        expr = F.when(cond, F.lit(platform)) if expr is None else expr.when(cond, F.lit(platform))
    return expr.otherwise(F.lit(PLATFORMS[0]))


def _mix(col: F.Column, salt: int, mod: int) -> F.Column:
    """Cheap deterministic pseudo-random in [0, mod): xxhash64 of (id, salt)."""
    return F.pmod(F.xxhash64(col, F.lit(salt)), F.lit(mod))


def _url_for(art: F.Column, seed: int) -> F.Column:
    """Platform-shaped URL for an article id (platform by weighted slot)."""
    platform = _platform_expr(_mix(art, seed, 100))
    url = None
    for p, (_dom, tmpl) in URL_SHAPES.items():
        pre, post = tmpl.split("{id}")
        u = F.concat(F.lit(pre), F.format_string("%08d", art), F.lit(post))
        url = F.when(platform == p, u) if url is None else url.when(platform == p, u)
    return url


def synth_frontier(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Seed frontier of n rows (round 0, depth 0).

    ~10% exact duplicates (same article id re-emitted) and ~5% near
    duplicates (same id + query-string noise) per FIXTURES.md §2.
    """
    df = spark.range(n).withColumnRenamed("id", "rid")
    # duplicate groups: 10% of rows point at the previous row's article
    art = F.when(_mix(F.col("rid"), seed + 1, 10) == 0, F.col("rid") - 1).otherwise(F.col("rid"))
    art = F.greatest(art, F.lit(0))
    platform = _platform_expr(_mix(art, seed, 100))
    url = _url_for(art, seed)
    # 5% get query-string noise that canonicalization must strip
    noisy = _mix(F.col("rid"), seed + 2, 20) == 0
    url = F.when(noisy, F.concat(url, F.lit("?log_from=abc123_"), F.col("rid"))).otherwise(url)

    dom = None
    for p, (d, _t) in URL_SHAPES.items():
        dom = F.when(platform == p, F.lit(d)) if dom is None else dom.when(platform == p, F.lit(d))

    return df.select(
        url.alias("url"),
        dom.alias("domain"),
        _mix(F.col("rid"), seed + 3, 3).cast("int").alias("priority"),
        F.lit(0).alias("depth"),
        F.col("rid").alias("seq"),
        F.lit(0).alias("round_added"),
        F.lit(0).alias("attempt"),
        F.concat(F.lit("seed-"), F.col("rid")).alias("source_seed"),
    )


# ---------------------------------------------------------------------------
# Synthetic pages: deterministic HTML per platform dialect
# ---------------------------------------------------------------------------

def _para_vars(art: F.Column, i) -> tuple:
    """The four per-paragraph format args of _BODY: paragraph number,
    article id, and two (article, paragraph)-mixed tokens.  The mixed
    tokens give every article per-paragraph word trigrams of its own —
    without them the corpus is ONE shared template and every document's
    minhash minima land on corpus-wide boilerplate shingles, which
    degenerates any LSH-banded dedup over the fixture into an all-pairs
    join (the hot-bucket pathology incremental_neardup's bucket_cap
    exists for; the fixture should exercise the realistic mixed regime,
    not only the degenerate one)."""
    return (i, art, art * 131 + i * 7, art * 269 + i * 13)


def _paras(art: F.Column, seed: int, fmt: str) -> F.Column:
    """6-17 deterministic paragraphs; fmt has the four _BODY slots.

    Sized so a synthetic page costs roughly what a real news page costs
    to parse (a 2-paragraph page would make the bench's extract stage
    unrealistically cheap).
    """
    n_paras = (_mix(art, seed + 10, 12) + 6).cast("int")
    return F.aggregate(
        F.sequence(F.lit(1), n_paras),
        F.lit(""),
        lambda acc, i: F.concat(acc, F.format_string(fmt, *_para_vars(art, i))),
    )


_BODY = (
    "Paragraph %s of article %08d with deterministic body text, a second "
    "sentence that pads entry %08d to something closer to real article "
    "prose, and a third clause mentioning dates near %08d, places and names "
    "so the parser walks a realistic amount of character data."
)
_P = "<p>" + _BODY + "</p>"


def _html_exprs(art: F.Column, seed: int) -> dict[str, F.Column]:
    """Minimal deterministic HTML per platform dialect, matching each
    reference parser's selectors (citations in functions/platforms.py)."""
    img = F.format_string('https://img.cc/i%08d.jpg', art)
    img2 = F.format_string('https://img.cc/j%08d.jpg', art)
    vid = F.format_string('https://v.cc/v%08d.mp4', art)
    title = F.format_string("Title %08d", art)
    day = (_mix(art, seed + 12, 28) + 1).cast("int")

    toutiao = F.concat(
        F.format_string("<html><body><h1>Title %08d</h1>", art),
        F.format_string(
            '<div class="article-meta"><span>2025-01-%02d</span>'
            '<span class="name"><a href="/c/user/%08d/">Author %08d</a></span></div>',
            day, art, art,
        ),
        F.lit("<article>"),
        _paras(art, seed, _P),
        # duplicate of paragraph 1 (dedup exercise) — same _para_vars
        F.format_string(_P, *_para_vars(art, F.lit(1))),
        F.format_string('<div><img src="%s"/></div>', img),
        F.when(_mix(art, seed + 11, 5) == 0,
               F.format_string('<video src="%s"></video>', vid)).otherwise(F.lit("")),
        F.lit("</article></body></html>"),
    )

    wechat_dom = F.concat(
        F.format_string('<html><body><h1 id="activity-name">Title %08d</h1>', art),
        F.format_string('<span id="profileBt">Account %04d</span>', F.pmod(art, F.lit(977))),
        F.format_string("<script>var createTime = '2025-01-%02d 09:30';</script>", day),
        F.lit('<div id="js_content"><section>'),
        _paras(art, seed, _P),
        F.lit("<ol><li>alpha</li><li>beta</li></ol>"),
        F.format_string('<p><img data-src="%s"/></p>', img),
        F.lit("</section></div></body></html>"),
    )
    # every 3rd wechat page is SSR cgiDataNew (no js_content) — exercises
    # the lenient-JS path in the pipeline
    wechat_ssr = F.format_string(
        "<html><body><script>try { window.cgiDataNew = { title: JsDecode('Title "
        "%08d'), nick_name: 'Account %04d', create_time: '2025-01-%02d 10:00', "
        "desc: JsDecode('line one of %08d\\x0aline two of %08d'), "
        "picture_page_info_list: [ { cdn_url: 'https://img.cc/s%08d.jpg' } ] }; "
        "} catch (e) {}</script></body></html>",
        art, F.pmod(art, F.lit(977)), day, art, art, art,
    )
    wechat = F.when(_mix(art, seed + 13, 3) == 0, wechat_ssr).otherwise(wechat_dom)

    netease = F.concat(
        F.format_string('<html><body><h1 class="post_title">Title %08d</h1>', art),
        F.format_string(
            '<div class="post_info">2025-01-%02d 08:00:00 来源: Source%03d</div>',
            day, F.pmod(art, F.lit(97)),
        ),
        F.lit('<div class="post_body">'),
        _paras(art, seed, _P),
        F.format_string('<p><img src="%s"/></p>', img),
        F.lit("</div></body></html>"),
    )

    sohu = F.concat(
        F.format_string('<html><body><h1>Title %08d</h1>', art),
        F.format_string('<span class="time">2025-01-%02d 12:00</span>', day),
        F.format_string(
            '<script>var data = { imgsList: [ {"url": "//img.cc/i%08d.jpg"}, '
            '{"url": "https://img.cc/j%08d.jpg"} ] ,};</script>',
            art, art,
        ),
        F.lit('<article id="mp-editor">'),
        _paras(art, seed, _P),
        F.lit('<p><img src="enc0"/></p><p><img src="enc1"/></p>'),
        F.lit("</article></body></html>"),
    )

    # reference-parseable shape (tencent_news.py:82-200): title strictly
    # from <h1>; window.DATA feeds only meta; content children of the
    # EXACT-class rich_media_content div
    tencent = F.concat(
        F.format_string(
            '<html><body><script>window.DATA = {"title": "Title %08d", '
            '"pubtime": "2025-01-%02d 14:00", "media": "Media%03d"} ;</script>',
            art, day, F.pmod(art, F.lit(97)),
        ),
        F.format_string("<h1>Title %08d</h1>", art),
        F.lit('<div class="rich_media_content">'),
        _paras(art, seed, _P),
        F.format_string('<p><img src="%s"/></p>', img),
        F.lit("</div></body></html>"),
    )

    bbc = F.concat(
        F.format_string("<html><body><h1>Title %08d</h1>", art),
        F.format_string('<time datetime="2025-01-%02dT10:00:00Z">x</time>', day),
        F.lit("<article>"),
        F.lit('<div data-component="text-block">'),
        _paras(art, seed, _P),
        F.lit("</div><figure>"),
        F.lit('<img src="https://img.cc/grey-placeholder.png"/>'),
        F.format_string('<img src="//img.cc/b%08d.jpg"/>', art),
        F.lit("</figure></article></body></html>"),
    )

    cnn = F.concat(
        F.format_string("<html><body><h1>Title %08d</h1>", art),
        F.format_string('<div class="byline__names">By Author %04d</div>', F.pmod(art, F.lit(977))),
        F.lit("<main>"),
        _paras(art, seed, '<p class="paragraph">' + _BODY + "</p>"),
        F.format_string('<picture><img src="%s"/></picture>', img),
        F.lit("</main></body></html>"),
    )

    # reference-parseable shape (detik_news.py:72-180): meta under
    # article[@class='detail']; cover img behind the exact child path
    # detail__media/figure.detail__media-image/img; body div carries the
    # EXACT double class
    detik = F.concat(
        F.format_string('<html><body><h1 class="detail__title">Title %08d</h1>', art),
        F.lit('<article class="detail">'),
        F.format_string('<div class="detail__date">2025-01-%02d</div>', day),
        F.format_string('<div class="detail__author">Reporter %04d</div>', F.pmod(art, F.lit(977))),
        F.format_string(
            '<div class="detail__media"><figure class="detail__media-image">'
            '<img src="%s"/></figure></div>',
            img2,
        ),
        F.lit('<div class="detail__body-text itp_bodycontent">'),
        _paras(art, seed, _P),
        F.format_string('<img src="%s"/>', img),
        F.lit("</div></article></body></html>"),
    )

    # reference-parseable shape (naver_news.py:42-236): title span under
    # the exact triple-class module div; nick author with <a>; exact
    # 'se_publishDate pcol2' span; content inside se-main-container
    naver_content = F.concat(
        F.format_string(
            '<html><body><div class="se-module se-module-text se-title-text">'
            "<span>Title %08d</span></div>",
            art,
        ),
        F.format_string(
            '<span class="nick"><a href="https://blog.naver.com/blogger%04d">'
            "Blogger %04d</a></span>",
            F.pmod(art, F.lit(977)), F.pmod(art, F.lit(977)),
        ),
        F.format_string(
            '<span class="se_publishDate pcol2">2025-01-%02d 10:00</span>', day
        ),
        F.lit('<div class="se-main-container"><div class="se-component se-text">'),
        _paras(art, seed, '<p class="se-text-paragraph">' + _BODY + "</p>"),
        F.lit('</div><div class="se-component se-image">'),
        F.format_string('<img src="%s"/>', img),
        F.lit("</div></div></body></html>"),
    )
    # half of naver blog URLs serve an iframe holder (the real content is
    # behind //iframe[@id='mainFrame']/@src — naver_news.py:179-195);
    # synth_pages emits matching PostView content rows for every id
    naver_holder = F.format_string(
        '<html><body><iframe id="mainFrame" '
        'src="/PostView.naver?blogId=newsroom&logNo=%08d"></iframe></body></html>',
        art,
    )
    naver = F.when(_mix(art, seed + 14, 2) == 0, naver_holder).otherwise(naver_content)

    lenny = F.concat(
        F.format_string('<html><body><h1 class="post-title">Title %08d</h1>', art),
        F.lit('<div class="available-content">'),
        _paras(art, seed, _P),
        F.lit("<ul><li>point a</li><li>point b</li></ul>"),
        F.format_string('<figure><img src="%s"/></figure>', img),
        F.lit("</div></body></html>"),
    )

    # quora: double-encoded answer JSON inside push("...") — build the inner
    # JSON then escape it twice, all JVM-side
    inner_content = F.format_string(
        '{"sections":[{"type":"text","spans":[{"text":"Answer body of %08d."}]}]}', art
    )
    inner_title = F.lit('{"sections":[{"spans":[{"text":"What is X?"}]}]}')

    def js_escape(c: F.Column) -> F.Column:
        return F.regexp_replace(F.regexp_replace(c, r"\\", r"\\\\"), '"', r'\\"')

    answer = F.concat(
        F.lit('{"data":{"answer":{"content":"'), js_escape(inner_content),
        F.lit('","creationTime":1700000000000000,"author":{"names":[{"givenName":"Jane","familyName":"Doe"}]},"question":{"title":"'),
        js_escape(inner_title),
        F.lit('"}}}}'),
    )
    quora = F.concat(
        F.lit('<html><script>x.push("'), js_escape(answer), F.lit('");</script></html>')
    )

    return {
        "toutiao": toutiao, "wechat": wechat, "netease": netease, "sohu": sohu,
        "tencent": tencent, "bbc": bbc, "cnn": cnn, "detik": detik,
        "naver": naver, "lenny": lenny, "quora": quora,
        "__naver_content": naver_content,  # PostView rows (not a platform)
    }


def synth_pages(spark: SparkSession, n: int, seed: int = 42, fanout: int = 3) -> DataFrame:
    """Synthetic web: one page per article id in [0, n), platform-correct
    HTML per dialect (so the whole extraction surface is exercised).

    out_links: `fanout` deeper toutiao article URLs derived from the id —
    includes back-links to smaller ids (already-seen, anti-join exercise).
    ~4% of pages return 404/500 (retry/quarantine exercise, base.py:26-28).
    """
    df = spark.range(n).withColumnRenamed("id", "rid")
    art = F.col("rid")
    platform = _platform_expr(_mix(art, seed, 100))
    url = _url_for(art, seed)

    status = (
        F.when(_mix(art, seed + 20, 50) == 0, F.lit(500))
        .when(_mix(art, seed + 21, 50) == 0, F.lit(404))
        .otherwise(F.lit(200))
    )
    html_by_platform = _html_exprs(art, seed)
    naver_content = html_by_platform.pop("__naver_content")
    html = None
    for p, h in html_by_platform.items():
        html = F.when(platform == p, h) if html is None else html.when(platform == p, h)

    # out-links: children 2*id+1.. (tree-ish growth) mod n — the web is
    # CLOSED (every discovered URL exists in the table).  Each link is
    # platform-shaped for its target id so discovered URLs spread over
    # all domains (a single-domain frontier would serialize the
    # per-domain rank window — the mega-host case deferral bounds)
    link_ids = F.transform(
        F.sequence(F.lit(1), F.lit(fanout)),
        lambda i: F.pmod(art * 2 + i * 7 + 1, F.lit(n)),
    )
    out_links = F.transform(link_ids, lambda lid: _url_for(lid, seed))
    main = df.select(
        url.alias("url"),
        status.cast("int").alias("status"),
        F.when(status == 200, html).otherwise(F.lit(None)).alias("html"),
        F.when(status == 200, out_links).otherwise(F.array().cast("array<string>")).alias(
            "out_links"
        ),
    )
    # PostView content rows for every naver id (iframe targets; always
    # 200 — the holder row already carries the error distribution)
    postview = df.filter(platform == "naver").select(
        F.format_string(
            "https://blog.naver.com/PostView.naver?blogId=newsroom&logNo=%08d", art
        ).alias("url"),
        F.lit(200).alias("status"),
        naver_content.alias("html"),
        out_links.alias("out_links"),
    )
    return main.unionByName(postview)


def synth_budgets(spark: SparkSession, capacity_default: int = 100) -> DataFrame:
    """Per-domain politeness budgets (pixabay 100/60s shape, base.py:16-26).

    The two mega-hosts get larger budgets (they'd dominate otherwise);
    one domain is nearly starved to exercise deferral.
    """
    rows = []
    for p, (dom, _t) in URL_SHAPES.items():
        cap = capacity_default
        if p in ("toutiao", "wechat"):
            cap = capacity_default * 4
        if p == "cnn":
            cap = max(1, capacity_default // 20)
        rows.append((dom, cap, 60, 0.0))
    return spark.createDataFrame(rows, schema.BUDGETS)


def synth_robots(spark: SparkSession) -> DataFrame:
    """Robots rules: one full-deny domain (quora), crawl-delay on naver."""
    rows = []
    for p, (dom, _t) in URL_SHAPES.items():
        allow = p != "quora"
        delay = 2.0 if p == "naver" else 0.0
        rows.append((dom, "/", allow, delay))
    return spark.createDataFrame(rows, schema.ROBOTS)


def synth_api_pages(
    spark: SparkSession, keywords: list[str], per_page: int = 4, seed: int = 42
) -> DataFrame:
    """Deterministic paginated search-API fixture for the video-side
    sweep (pixabay VideoSearchResponse shape, video_crawler/pixabay/
    common/schemas.py:50-60): per keyword, `total_hits` in [3, 18] and
    ceil(total/per_page) pages of hits; some media ids are shared
    across keywords (exercises A7 cross-keyword dedup)."""
    kw = spark.createDataFrame([(k,) for k in keywords], "keyword string")
    total = (_mix(F.xxhash64("keyword"), seed + 30, 16) + 3).cast("int")
    n_pages = F.ceil(total / per_page).cast("int")
    pages = kw.select(
        "keyword", total.alias("total_hits"), F.explode(F.sequence(F.lit(1), n_pages)).alias("page")
    )
    start = (F.col("page") - 1) * per_page
    count_on_page = F.least(F.lit(per_page), F.col("total_hits") - start)
    idx = F.sequence(F.lit(0), count_on_page - 1)
    hits = F.transform(
        idx,
        lambda i: F.struct(
            # ~1/3 of hits collide onto a shared global id pool
            F.when(
                _mix(F.xxhash64("keyword") + start + i, seed + 31, 3) == 0,
                F.concat(F.lit("shared-"), F.pmod(F.xxhash64("keyword") + start + i, F.lit(7))),
            )
            .otherwise(F.concat(F.col("keyword"), F.lit("-m"), start + i))
            .alias("media_id"),
            F.concat(F.lit("https://v.cc/"), F.col("keyword"), F.lit("/"), (start + i)).alias(
                "media_url"
            ),
            (_mix(F.xxhash64("keyword") + start + i, seed + 32, 100000)).cast("int").alias("views"),
        ),
    )
    return pages.select("keyword", "page", hits.alias("hits"), "total_hits")
