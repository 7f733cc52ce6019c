"""Debug/visualization sink (S8, ``src/utility.cpp:50-102``).

The reference draws detected boxes onto the image and ``imwrite``s it; our
analog renders detected spans inline in the page source as an HTML report —
a driver-side sample dump, never on the hot path (``df.limit(n)`` only).
"""

from __future__ import annotations

import html as _html
import pathlib

from pyspark.sql import DataFrame


def dump_sample(extracted: DataFrame, out_path: str, n: int = 10) -> str:
    """Write an HTML report of the first ``n`` extraction rows."""
    rows = extracted.limit(n).collect()
    parts = [
        "<!DOCTYPE html><html><head><meta charset='utf-8'>"
        "<style>body{font-family:monospace} .page{border:1px solid #999;"
        "margin:1em;padding:1em} .span{background:#cfc} .err{color:#c00}"
        "</style></head><body><h1>extraction sample</h1>"
    ]
    for r in rows:
        parts.append(f"<div class='page'><h3>{_html.escape(r.url)}</h3>")
        if not r.success:
            parts.append(f"<p class='err'>{_html.escape(r.error or '')}</p>")
        else:
            parts.append(
                f"<p>{r.n_blocks} spans</p><ol>"
                + "".join(
                    f"<li><span class='span'>{_html.escape(s.text[:200])}</span>"
                    f" <small>[{s.start},{s.end}) conf={s.confidence:.3f}"
                    f" block={s.block_id}]</small></li>"
                    for s in r.spans[:50]
                )
                + "</ol>"
            )
        parts.append("</div>")
    parts.append("</body></html>")
    p = pathlib.Path(out_path)
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text("".join(parts), encoding="utf-8")
    return str(p)
