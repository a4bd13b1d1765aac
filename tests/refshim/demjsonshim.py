"""demjson3 stand-in: lenient JS-object decode via the engine's pure
python twin (newscrawler_spark.functions.wechat._lenient_js_loads);
raises json.JSONDecodeError (a ValueError) on undecodable input, which
the reference's broad except clauses catch just like demjson3's own
error type."""

from __future__ import annotations

import json

from newscrawler_spark.functions.wechat import _lenient_js_loads

JSONDecodeError = json.JSONDecodeError


def decode(text: str):  # noqa: ANN201
    return _lenient_js_loads(text)
