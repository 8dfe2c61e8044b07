"""Multimodal (binary-column) plumbing.

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata — the reference's content-type probes (``is_img``/``is_rgb``/
... src/DataCurator.jl:3230-3242) map to cheap magic-byte sniffing, and
its content ops (gaussian/threshold/describe_image,
src/DataCurator.jl:1111-1199, 902-916) map to Arrow-batched decode /
feature-extract stages over ``mapInPandas``.

The decode libraries (Pillow, ffmpeg, ...) are NOT in this container, so
``decode_images(..., fake=True)`` (default) produces a deterministic
fake feature row (so the Spark-side plumbing — schema, batch shape,
partitioning — is real and tested). ``fake=False`` uses Pillow when it
is importable on the worker (optional-import, round-3) and raises
``ImportError`` with install guidance when it is not. Everything around
the decode call is production code either way.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (type, magic-prefix) — cheap native sniffing on the first bytes
_MAGIC = (
    ("png", b"\x89PNG"),
    ("jpeg", b"\xff\xd8\xff"),
    ("gif", b"GIF8"),
    ("pdf", b"%PDF"),
    ("riff", b"RIFF"),  # wav/avi container
    ("html", b"<htm"),
    ("html", b"<!DO"),
)


def sniff_content_type(payload: Column) -> Column:
    """Magic-byte content sniffing, fully native: substring on binary +
    when-chain. The cheap probe that ORDERS ahead of any decode stage
    (the reference's is_img-before-describe pattern)."""
    expr = F.lit("unknown")
    for name, magic in reversed(_MAGIC):
        prefix = F.substring(payload, 1, len(magic))
        expr = F.when(prefix == F.lit(magic), F.lit(name)).otherwise(expr)
    return F.when(payload.isNull() | (F.length(payload) == 0), F.lit("empty")).otherwise(
        expr
    )


# Named entities unescaped by extract_html_text, IN ORDER; `&amp;` is
# handled last and separately (unescaping it earlier would
# double-unescape nested entities: '&amp;lt;' must yield '&lt;', not
# '<'). The set is the named entities that actually occur at frequency
# in web crawls (WET-style extractions); everything else arrives as a
# numeric character reference and is handled generally below.
_NAMED_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&apos;", "'"),
    ("&nbsp;", " "), ("&mdash;", "—"), ("&ndash;", "–"),
    ("&hellip;", "…"), ("&lsquo;", "‘"), ("&rsquo;", "’"),
    ("&ldquo;", "“"), ("&rdquo;", "”"), ("&middot;", "·"),
    ("&bull;", "•"), ("&copy;", "©"), ("&reg;", "®"),
    ("&trade;", "™"), ("&deg;", "°"), ("&plusmn;", "±"),
    ("&sect;", "§"), ("&para;", "¶"), ("&laquo;", "«"),
    ("&raquo;", "»"), ("&times;", "×"), ("&divide;", "÷"),
    ("&eacute;", "é"), ("&egrave;", "è"), ("&agrave;", "à"),
    ("&ccedil;", "ç"), ("&auml;", "ä"), ("&ouml;", "ö"),
    ("&uuml;", "ü"), ("&szlig;", "ß"),
)

#: segment marker for the numeric-entity split pass — U+0001 never
#: survives real crawl text (it is stripped first on all engines)
_MARK = "\x01"
_NUM_DEC_RE = "&#([0-9]{1,7});"
_NUM_HEX_RE = "&#([xX][0-9a-fA-F]{1,6});"


def _code_to_char(seg: Column) -> Column:
    """Decode one marked numeric-reference segment ('8217' / 'x27' /
    'X2019') to its character — the Spark side of the pinned contract:

    - invalid code points re-emit the ORIGINAL entity text (HTML
      browsers render U+FFFD; a text pipeline must not inject
      replacement chars into clean text). Invalid = 0, surrogates
      D800-DFFF, > 0x10FFFF, plus (round 6, caught by the
      html.unescape fuzz) the HTML5 numeric-character-reference error
      set html.unescape silently DROPS: C0 controls other than
      tab/lf/cr, DEL, and the 66 noncharacters (FDD0-FDEF and the
      FFFE/FFFF pair of every plane). Dropping chars mid-pipeline
      would silently edit text, so this engine keeps the reference
      verbatim instead — same class as the surrogate rule, and d50's
      encoding-noise metrics can still see it. C1 refs (128-159)
      remain the documented deviation: html.unescape remaps them to
      cp1252, this chain decodes them literally;
    - ``&#38;``/``&#x26;`` (ampersand) re-emits ``&amp;`` so the final
      &amp;-last named pass unescapes it exactly once — '&#38;lt;' must
      yield '&lt;', not '<' (the same no-double-unescape rule the named
      chain pins);
    - ``&#160;`` (NBSP) normalizes to a plain space, matching the
      pinned ``&nbsp;`` mapping (so the whitespace collapse sees it);
    - BMP code points decode via UTF-16BE bytes; supplementary points
      via the surrogate-pair arithmetic (Spark's decode() has no UTF-32
      charset — DuckDB's chr() takes the code point directly)."""
    is_hex = F.upper(F.substring(seg, 1, 1)) == F.lit("X")
    code = F.when(
        is_hex, F.conv(F.substring(seg, 2, 6), 16, 10).cast("bigint")
    ).otherwise(seg.cast("bigint"))
    invalid = (
        (code < 1)
        | (code > 0x10FFFF)
        | ((code >= 0xD800) & (code <= 0xDFFF))
        | (code <= 0x8)
        | (code == 0xB)
        | ((code >= 0xE) & (code <= 0x1F))
        | (code == 0x7F)
        | ((code >= 0xFDD0) & (code <= 0xFDEF))
        | (F.pmod(code, F.lit(0x10000)) >= 0xFFFE)
    )
    bmp = F.decode(F.unhex(F.lpad(F.hex(code), 4, "0")), "UTF-16BE")
    v = code - F.lit(0x10000)
    hi = F.floor(v / F.lit(1024)).cast("bigint") + F.lit(0xD800)
    lo = F.pmod(v, F.lit(1024)).cast("bigint") + F.lit(0xDC00)
    supp = F.decode(
        F.unhex(F.concat(F.lpad(F.hex(hi), 4, "0"), F.lpad(F.hex(lo), 4, "0"))),
        "UTF-16BE",
    )
    return (
        F.when(invalid, F.concat(F.lit("&#"), seg, F.lit(";")))
        .when(code == 38, F.lit("&amp;"))
        .when(code == 160, F.lit(" "))
        .when(code <= 0xFFFF, bmp)
        .otherwise(supp)
    )


def unescape_numeric_entities(txt: Column) -> Column:
    """GENERAL numeric character references (round-6, VERDICT r5 Next
    #5): ``&#NNN;`` (1-7 digits) and ``&#xHH;``/``&#XHH;`` (1-6 hex) —
    real crawl HTML is full of ``&#8217;``-style apostrophes that a
    fixed replace chain leaves escaped.

    Shape: mark every reference with U+0001 fences (two regexp passes),
    split on the fence, decode the odd segments, re-join. The decode is
    ONE transform() over the split array — a higher-order function, i.e.
    CodegenFallback: acceptable here because extract_html_text is a
    content-LOADING stage (runs once per raw page, like the Arrow
    classifier stages), not the per-row decision hot path, and the
    segment count is bounded by the entity count, not the text length.
    The DuckDB twin is the structurally identical
    list_transform((s, i) -> ...) — see unescape_numeric_entities_sql."""
    txt = F.replace(txt, F.lit(_MARK), F.lit(""))
    txt = F.regexp_replace(txt, _NUM_DEC_RE, _MARK + "$1" + _MARK)
    txt = F.regexp_replace(txt, _NUM_HEX_RE, _MARK + "$1" + _MARK)
    parts = F.split(txt, _MARK, -1)
    dec = F.transform(
        parts,
        lambda s, i: F.when(i % 2 == 0, s).otherwise(_code_to_char(s)),
    )
    return F.array_join(dec, "")


def extract_html_text(html: Column, numeric_entities: bool = True) -> Column:
    """Native HTML -> text extraction: decode UTF-8 (invalid bytes
    replaced), strip script/style blocks, strip tags, decode numeric
    character references (general since round 6), unescape the common
    named entities, collapse whitespace. Deterministic; the graft's
    analogue of the reference's content loaders
    (/root/reference/src/DataCurator.jl:1277-1301 load_content).

    Round-5: every pattern is written in the Java/RE2-shared subset so
    the d46 DuckDB oracle is STRUCTURALLY identical — script and style
    blocks are stripped by two separate lazy patterns (RE2 has no
    backreferences), and the whitespace collapse spells the ASCII class
    explicitly (identical to Java's default ASCII ``\\s``; CLAUDE.md
    invariant). Trim-after-collapse: edge whitespace is a plain space by
    then, so the space-only trim is a true whitespace trim.

    Round-6 ordering contract: numeric references decode BEFORE the
    named chain (``&#38;`` re-emits ``&amp;`` so the &amp;-last rule
    holds across both passes), and the chain order is pinned — change
    it in one engine and the d46 byte-compare breaks. Fidelity bound
    (documented): entity text SYNTHESIZED by an earlier decode (e.g.
    ``&&#97;mp;`` assembling ``&amp;`` out of pieces) follows this
    pinned chain, not a spec-grade single-pass parser; C1 refs
    (``&#146;``) decode literally, not via the browsers' Windows-1252
    remap. ``numeric_entities=False`` restores the round-5 chain (and
    its pure-codegen plan) for callers that need it."""
    txt = html.cast("string")  # UTF-8 decode, lossy on bad bytes
    txt = F.regexp_replace(txt, r"(?is)<script[^>]*>.*?</script>", " ")
    txt = F.regexp_replace(txt, r"(?is)<style[^>]*>.*?</style>", " ")
    txt = F.regexp_replace(txt, r"(?s)<[^>]*>", " ")
    if numeric_entities:
        txt = unescape_numeric_entities(txt)
    for ent, ch in _NAMED_ENTITIES + (("&amp;", "&"),):
        txt = F.replace(txt, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(txt, r"[ \t\n\x0b\f\r]+", " "))


def _sql_code_expr(s: str) -> str:
    """DuckDB expression for the code point of a marked segment."""
    return (
        f"(CASE WHEN upper(substr({s}, 1, 1)) = 'X' "
        f"THEN ('0x' || substr({s}, 2))::BIGINT ELSE {s}::BIGINT END)"
    )


def unescape_numeric_entities_sql(expr: str) -> str:
    """DuckDB twin of unescape_numeric_entities — structurally identical
    mark/split/decode/join; chr() takes the code point directly (no
    surrogate-pair arithmetic needed on this side)."""
    c = _sql_code_expr("s")
    decode = (
        f"CASE WHEN {c} < 1 OR {c} > 1114111 OR ({c} BETWEEN 55296 AND 57343) "
        f"OR {c} <= 8 OR {c} = 11 OR ({c} BETWEEN 14 AND 31) OR {c} = 127 "
        f"OR ({c} BETWEEN 64976 AND 65007) OR ({c} % 65536) >= 65534 "
        "THEN '&#' || s || ';' "
        f"WHEN {c} = 38 THEN '&amp;' "
        f"WHEN {c} = 160 THEN ' ' "
        f"ELSE chr({c}::INTEGER) END"
    )
    marked = (
        f"regexp_replace(regexp_replace(replace({expr}, chr(1), ''), "
        f"'{_NUM_DEC_RE}', chr(1) || '\\1' || chr(1), 'g'), "
        f"'{_NUM_HEX_RE}', chr(1) || '\\1' || chr(1), 'g')"
    )
    return (
        f"array_to_string(list_transform(string_split({marked}, chr(1)), "
        f"(s, i) -> CASE WHEN i % 2 = 1 THEN s ELSE {decode} END), '')"
    )


def extract_html_text_sql(expr: str, numeric_entities: bool = True) -> str:
    """DuckDB twin of extract_html_text: the full pipeline as one SQL
    expression (used by the d46 oracle), generated from the SAME
    _NAMED_ENTITIES table so the chains cannot drift."""
    out = (
        "regexp_replace(regexp_replace(regexp_replace("
        f"{expr}, '(?is)<script[^>]*>.*?</script>', ' ', 'g'), "
        "'(?is)<style[^>]*>.*?</style>', ' ', 'g'), "
        "'(?s)<[^>]*>', ' ', 'g')"
    )
    if numeric_entities:
        out = unescape_numeric_entities_sql(out)
    for ent, ch in _NAMED_ENTITIES + (("&amp;", "&"),):
        lit = ch.replace("'", "''")
        out = f"replace({out}, '{ent}', '{lit}')"
    return f"trim(regexp_replace({out}, '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g'))"


IMAGE_FEATURES_SCHEMA = (
    "width int, height int, n_channels int, mean_intensity double, decode_ok boolean"
)


def decode_images(
    df: DataFrame,
    payload_col: str = "html",
    fake: bool = True,
    batch_note: str | None = None,
) -> DataFrame:
    """Arrow-batched image decode / feature extraction over mapInPandas.

    Appends IMAGE_FEATURES_SCHEMA columns. ``fake=True`` (this
    container) emits deterministic pseudo-features derived from payload
    length/bytes; ``fake=False`` decodes with Pillow when importable on
    the worker (undecodable payloads yield ``decode_ok=false`` nulls,
    never a task failure) and raises ``ImportError`` when it is not.
    """
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", " + IMAGE_FEATURES_SCHEMA

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not fake:
            Image = _require_pillow()
        for pdf in batches:
            payloads = pdf[payload_col]
            pdf = pdf.copy()
            if fake:
                # deterministic stand-in: features from byte stats
                lens = payloads.map(lambda b: len(b) if b is not None else 0)
                pdf["width"] = (lens % 640).astype("int32")
                pdf["height"] = (lens % 480).astype("int32")
                pdf["n_channels"] = 3
                pdf["mean_intensity"] = (
                    payloads.map(lambda b: (sum(b[:64]) / max(len(b[:64]), 1)) if b else 0.0)
                ).astype("float64")
                pdf["decode_ok"] = lens > 0
            else:
                import io

                import numpy as np

                feats = []
                for b in payloads:
                    try:
                        img = Image.open(io.BytesIO(b))
                        arr = np.asarray(img.convert("L"), dtype="float64")
                        feats.append(
                            (img.width, img.height, len(img.getbands()),
                             float(arr.mean()), True)
                        )
                    except Exception:
                        feats.append((None, None, None, None, False))
                cols = ["width", "height", "n_channels", "mean_intensity", "decode_ok"]
                for i, c in enumerate(cols):
                    pdf[c] = [f[i] for f in feats]
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


IMAGE_DESCRIBE_SCHEMA = (
    "minimum double, q1 double, mean double, median double, q3 double, "
    "maximum double, std double, kurtosis double, px_type string, "
    "dimension string"
)


def _image_moments(vals):
    """The reference's ``dimg`` moment fold (src/DataCurator.jl:1252-1267)
    over a flat value array: drop zero-valued entries, then
    (min, Q1, mean, median, Q3, max, std, kurtosis).

    Pinned semantics:
    - zero-valued pixels are DROPPED before the stats (reference
      ``ys[ys .> 0]``); an all-zero/empty array yields all-NaN (the
      reference warns and returns NaN×8).
    - quantiles are linear-interpolated (numpy default == Julia default).
    - std is the Bessel-corrected sample std (Julia ``std``); NaN for a
      single surviving value.
    - kurtosis is the INTENDED excess kurtosis m4/m2² − 3 with
      population moments — the reference computes ``m2/m4`` (an
      inversion bug at :1264); as with descriptive_size we keep intended
      semantics, documented here.
    """
    import numpy as np

    ys = np.asarray(vals, dtype=np.float64).ravel()
    ys = ys[ys > 0]
    if ys.size == 0:
        return (float("nan"),) * 8
    q1, med, q3 = (float(q) for q in np.quantile(ys, [0.25, 0.5, 0.75]))
    mx = float(ys.mean())
    m2 = float(((ys - mx) ** 2).mean())
    m4 = float(((ys - mx) ** 4).mean())
    kurt = m4 / (m2 * m2) - 3.0 if m2 > 0 else float("nan")
    std = float(ys.std(ddof=1)) if ys.size > 1 else float("nan")
    return (float(ys.min()), q1, mx, med, q3, float(ys.max()), std, kurt)


def describe_images(
    df: DataFrame, payload_col: str = "html", fake: bool = True
) -> DataFrame:
    """Per-image 8-moment describe — the reference's ``describe_image``
    (src/DataCurator.jl:902-916) as an Arrow-batched mapInPandas stage
    appending IMAGE_DESCRIBE_SCHEMA columns (the moment names mirror the
    reference's DataFrame columns; ``px_type``/``dimension`` mirror its
    ``type``/``dimension``).

    ``fake=True`` (this container): the SAME moment fold over the raw
    payload bytes (uint8) — deterministic, fully testable without a
    decoder, and byte-for-byte the production moment code. ``fake=False``
    decodes with Pillow to grayscale and folds over pixel values
    (undecodable payloads yield an all-null row, never a task failure).
    A NULL payload yields an all-null row in BOTH branches (pinned by
    test; ADVICE r4 — the fake branch used to type it uint8/'(0,)');
    an EMPTY payload is a real value: NaN moments with a typed
    zero-length shape.

    NaN moments (all-zero input, single-value std) arrive as SQL NULL:
    Arrow treats pandas NaN as missing — the reference's NaN row maps to
    Spark's native missing representation.
    """
    cols = [
        "minimum", "q1", "mean", "median", "q3", "maximum", "std", "kurtosis",
    ]
    clash = [c for c in (*cols, "px_type", "dimension") if c in df.columns]
    if clash:
        # a duplicate field in the mapInPandas schema would crash at
        # execution with a column-count mismatch — fail eagerly instead
        raise ValueError(
            f"describe_images: input already has column(s) {clash} — "
            "rename or drop them first"
        )
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", " + IMAGE_DESCRIBE_SCHEMA

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        if not fake:
            Image = _require_pillow()
        for pdf in batches:
            pdf = pdf.copy()
            rows = []
            for b in pdf[payload_col]:
                if fake:
                    if b is None:
                        # NULL payload -> all-null row, matching the
                        # decode branch's undecodable-input contract
                        # (ADVICE r4: the branches used to disagree —
                        # fake emitted uint8/'(0,)' for NULL)
                        rows.append((None,) * 8 + (None, None))
                        continue
                    arr = np.frombuffer(b, dtype=np.uint8)
                    rows.append(
                        _image_moments(arr) + ("uint8", f"({arr.size},)")
                    )
                else:
                    import io

                    try:
                        img = Image.open(io.BytesIO(b))
                        arr = np.asarray(img.convert("L"))
                        rows.append(
                            _image_moments(arr)
                            + (str(arr.dtype), str(arr.shape))
                        )
                    except Exception:
                        rows.append((None,) * 8 + (None, None))
            for i, c in enumerate(cols):
                pdf[c] = [r[i] for r in rows]
            pdf["px_type"] = [r[8] for r in rows]
            pdf["dimension"] = [r[9] for r in rows]
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def _require_pillow():
    """Optional-import seam: resolve Pillow on the worker or fail with
    actionable guidance (the round-2 stub raised unconditionally)."""
    try:
        from PIL import Image  # type: ignore
    except ImportError as e:
        raise ImportError(
            "fake=False requires Pillow on the executors "
            "(pip install pillow, or ship it via --py-files/conda env); "
            "use fake=True for the deterministic stand-in"
        ) from e
    return Image


def resize_images(
    df: DataFrame,
    payload_col: str = "html",
    target: tuple[int, int] = (224, 224),
    fake: bool = True,
) -> DataFrame:
    """Arrow-batched image resize stage. Appends ``resized`` (binary) +
    ``resized_w``/``resized_h``. ``fake=True`` emits a deterministic
    truncated-bytes stand-in exercising the real batch plumbing;
    ``fake=False`` resizes with Pillow when importable (undecodable
    payloads yield a null ``resized``), else raises ``ImportError``."""
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", resized binary, resized_w int, resized_h int"
    tw, th = target

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not fake:
            Image = _require_pillow()
        for pdf in batches:
            pdf = pdf.copy()
            if fake:
                # deterministic: resized payload = first w*h/64 bytes
                budget = max(tw * th // 64, 1)
                pdf["resized"] = pdf[payload_col].map(
                    lambda b: (b or b"")[:budget]
                )
            else:
                import io

                def resize_one(b):
                    try:
                        img = Image.open(io.BytesIO(b)).resize((tw, th))
                        buf = io.BytesIO()
                        img.save(buf, format="PNG")
                        return buf.getvalue()
                    except Exception:
                        return None

                res = pdf[payload_col].map(resize_one)
                pdf["resized"] = res
                # failed decodes report null dims, not the target (a
                # consumer filtering resized_w == target must not select
                # rows with no image bytes)
                ok = res.notna()
                pdf["resized_w"] = pd.Series(tw, index=pdf.index).where(ok)
                pdf["resized_h"] = pd.Series(th, index=pdf.index).where(ok)
                yield pdf
                continue
            pdf["resized_w"] = tw
            pdf["resized_h"] = th
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def frame_sample_plan(
    df: DataFrame, payload_col: str, every_n: int, id_col: str
) -> DataFrame:
    """Video frame-sampling PLAN: emit (id, frame_idx) rows for a
    decoder stage to fill — the Spark-side shape of frame sampling
    (explode before decode so frames parallelize across tasks). The
    frame count is stubbed as a deterministic function of payload size
    (real path: container metadata probe)."""
    n_frames = (F.length(F.col(payload_col)) / 100 + 1).cast("int")
    return (
        df.select(F.col(id_col), n_frames.alias("_nf"))
        .select(
            id_col,
            F.explode(F.sequence(F.lit(0), F.col("_nf") - 1, F.lit(every_n))).alias(
                "frame_idx"
            ),
        )
    )
