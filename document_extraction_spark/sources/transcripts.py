"""Deterministic synthetic transcripts table (FIXTURES.md §1).

Schema (BASELINE.json ``input_hint``):
``conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp``.

Payload mix: ~40% HTML-ish (boilerplate nav/header/footer/aside around main
content — exercises the Arc90 strip), ~30% PDF-layout-ish (positioned
``token@x,y`` page representation — exercises line/block clustering and
reading order, incl. two-column pages), ~30% plain/markdown incl. fenced
```` ```json ```` blocks (exercises the reference's fence-strip slice
semantics, /root/reference/src/pdf_extractor/extractor.py:112-118). A fixed
set of edge-case conversations (empty/whitespace payloads, lone fences, NFD
vs NFC, CRLF, a single oversized turn as the skew unit) is always appended.

Everything is seeded — same (seed, n_convs) => byte-identical table.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima "
    "mike november oscar papa quebec romeo sierra tango uniform victor whiskey "
    "xray yankee zulu data query table column filter window merge batch stream"
).split()

ROLES = ["user", "assistant", "tool", "system"]
TOOLS = [None, "search", "browser", "python", "calculator"]
_EPOCH = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)


def _sentence(rng: np.random.Generator, lo: int = 6, hi: int = 18) -> str:
    n = int(rng.integers(lo, hi))
    return " ".join(rng.choice(WORDS, size=n)) + "."


def _paragraphs(rng: np.random.Generator, n_lo: int = 1, n_hi: int = 4) -> list[str]:
    return [_sentence(rng, 8, 30) for _ in range(int(rng.integers(n_lo, n_hi + 1)))]


def _html_payload(rng: np.random.Generator) -> str:
    paras = _paragraphs(rng, 2, 4)
    nav_links = " ".join(
        f'<a href="/{w}">{w}</a>' for w in rng.choice(WORDS, size=5)
    )
    body = "\n".join(f"<p>{p}</p>" for p in paras)
    heading = f"<h1>{_sentence(rng, 3, 6)}</h1>" if rng.random() < 0.5 else ""
    linkfarm = (
        '<div class="related">'
        + " ".join(f'<a href="#{w}">{w} {w}</a>' for w in rng.choice(WORDS, size=6))
        + "</div>"
    )
    return (
        "<html><head><title>t</title></head><body>"
        f"<nav>{nav_links}</nav><header><span>site</span></header>"
        f"<article>{heading}{body}</article>"
        f"{linkfarm}"
        f"<aside>{_sentence(rng, 4, 8)}</aside>"
        f"<footer>{nav_links}</footer></body></html>"
    )


def _pdf_payload(rng: np.random.Generator) -> str:
    two_col = rng.random() < 0.4
    # right column starts beyond any left-column line extent (max ~430)
    cols = [50.0, 560.0] if two_col else [50.0]
    lines_out: list[str] = []
    for x0 in cols:
        y = 40.0
        for _ in range(int(rng.integers(1, 4))):  # blocks
            for _ in range(int(rng.integers(1, 5))):  # lines per block
                x = x0
                for w in rng.choice(WORDS, size=int(rng.integers(3, 8))):
                    lines_out.append(f"{w}@{x:.1f},{y:.1f}")
                    x += 6.0 * (len(w) + 1)
                y += 12.0
            y += 30.0  # block gap > LEADING
    # emit tokens in a shuffled order: the layout parser must re-sort
    rng.shuffle(lines_out)
    return "\n".join(lines_out)


def _plain_payload(rng: np.random.Generator) -> str:
    r = rng.random()
    paras = _paragraphs(rng, 1, 3)
    body = "\n\n".join(paras)
    if r < 0.30:
        keys = rng.choice(WORDS, size=3)
        inner = ",\n".join(f'  "{k}": "{_sentence(rng, 2, 5)}"' for k in keys)
        return f"```json\n{{\n{inner}\n}}\n```"
    if r < 0.40:
        return "```\n" + body + "\n```"
    if r < 0.50:
        return body.replace("\n", "\r\n")
    if r < 0.60:
        return "  " + body.replace(" ", "  ") + "\t"
    return body


def _edge_rows() -> list[tuple[str, int, str, str, str | None]]:
    import unicodedata
    nfd_cafe = unicodedata.normalize("NFD", "café crème")  # decomposed input
    return [
        ("conv-edge-empty", 0, "user", "", None),
        ("conv-edge-empty", 1, "assistant", "   \t  ", None),
        ("conv-edge-empty", 2, "tool", "\n\n\n", "search"),
        ("conv-edge-fence", 0, "user", "```json\n{\"a\": 1}\n```", None),
        ("conv-edge-fence", 1, "assistant", "```", None),
        ("conv-edge-fence", 2, "user", "``` ```", None),
        ("conv-edge-fence", 3, "assistant", "```json```x```", None),
        ("conv-edge-fence", 4, "user", "```json\n{\"broken\": \n```", None),
        ("conv-edge-unicode", 0, "user", nfd_cafe, None),
        ("conv-edge-unicode", 1, "assistant", "a\r\nb\rc d e", None),
        ("conv-edge-badhtml", 0, "user", "<div><p>unclosed paragraph drifting", None),
        ("conv-edge-badhtml", 1, "assistant", "<p></p><div> </div>", None),
        ("conv-edge-badpdf", 0, "tool", "tok@1,2\nnot a token line\nword@3.5,4", "python"),
        ("conv-edge-huge", 0, "user", ("lorem ipsum dolor sit amet " * 8000).strip(), None),
    ]


POOL_SIZE = 600  # payload variants per kind; fixed so output is stable in n_convs


def _payload_pools(rng: np.random.Generator) -> dict[str, np.ndarray]:
    """Deterministic pools of payload variants. Turn payloads are drawn from
    these by index — vectorized assembly, generator scales to millions of
    turns (the per-payload builders are the slow, rich path)."""
    return {
        "html": np.array([_html_payload(rng) for _ in range(POOL_SIZE)], dtype=object),
        "pdf": np.array([_pdf_payload(rng) for _ in range(POOL_SIZE)], dtype=object),
        "plain": np.array([_plain_payload(rng) for _ in range(POOL_SIZE)], dtype=object),
    }


def generate_transcripts_pdf(n_convs: int, seed: int = 7) -> pd.DataFrame:
    """Generate the transcripts table as one pandas DataFrame (vectorized)."""
    rng = np.random.default_rng(seed)
    pools = _payload_pools(rng)

    # skewed sizes: most 2-20 turns, ~3% long conversations (skew exerciser)
    is_long = rng.random(n_convs) < 0.03
    sizes = np.where(
        is_long, rng.integers(50, 400, n_convs), rng.integers(2, 21, n_convs)
    )
    total = int(sizes.sum())

    conv_ids = np.array(
        [f"conv-{seed:04d}-{c:08d}" for c in range(n_convs)], dtype=object
    ).repeat(sizes)
    # turn_idx: 0..size-1 within each conversation
    ends = np.cumsum(sizes)
    starts = ends - sizes
    turn_idx = np.arange(total, dtype=np.int64) - starts.repeat(sizes)

    # roles: 80% strict user/assistant alternation, 20% random
    alt = np.where(turn_idx % 2 == 0, "user", "assistant")
    rand_roles = np.array(ROLES, dtype=object)[rng.integers(0, len(ROLES), total)]
    roles = np.where(rng.random(total) < 0.8, alt, rand_roles).astype(object)

    # payload kind mix ~40/30/30 drawn per turn, payload by pool index
    r = rng.random(total)
    pool_idx = rng.integers(0, POOL_SIZE, total)
    text = np.empty(total, dtype=object)
    m_html = r < 0.40
    m_pdf = (r >= 0.40) & (r < 0.70)
    m_plain = r >= 0.70
    text[m_html] = pools["html"][pool_idx[m_html]]
    text[m_pdf] = pools["pdf"][pool_idx[m_pdf]]
    text[m_plain] = pools["plain"][pool_idx[m_plain]]

    tools_arr = np.array(TOOLS, dtype=object)[rng.integers(0, len(TOOLS), total)]
    tool = np.where(roles == "tool", tools_arr, None).astype(object)

    pdf = pd.DataFrame(
        {
            "conv_id": conv_ids,
            "turn_idx": turn_idx,
            "role": roles,
            "text": text,
            "tool": tool,
        }
    )
    edge = pd.DataFrame(
        _edge_rows(), columns=["conv_id", "turn_idx", "role", "text", "tool"]
    )
    pdf = pd.concat([pdf, edge], ignore_index=True)
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    # monotone within conv_id: epoch + conv hash offset + turn_idx seconds
    conv_codes = pdf["conv_id"].astype("category").cat.codes.astype("int64")
    pdf["ts"] = pd.Timestamp(_EPOCH) + pd.to_timedelta(
        conv_codes * 3600 + pdf["turn_idx"].astype("int64"), unit="s"
    )
    pdf["ts"] = pdf["ts"].dt.tz_convert(None)  # naive UTC for parquet/Spark
    return pdf


def generate_partition_pdf(part_idx: int, convs_per_part: int, seed: int = 7) -> pd.DataFrame:
    """Generate one PARTITION of the transcripts table, independently of all
    other partitions (per-partition RNG seeded by (seed, part_idx)) — the
    executor-side unit of the custom Python data source
    (sources/synthsource.py). Same (seed, part_idx, convs_per_part) =>
    byte-identical partition, regardless of cluster parallelism."""
    rng = np.random.default_rng(seed * 100_003 + part_idx)
    pools = _payload_pools(rng)
    n_convs = convs_per_part
    is_long = rng.random(n_convs) < 0.03
    sizes = np.where(
        is_long, rng.integers(50, 400, n_convs), rng.integers(2, 21, n_convs)
    )
    total = int(sizes.sum())
    conv_ids = np.array(
        [f"conv-{seed:04d}-p{part_idx:05d}-{c:06d}" for c in range(n_convs)],
        dtype=object,
    ).repeat(sizes)
    ends = np.cumsum(sizes)
    starts = ends - sizes
    turn_idx = np.arange(total, dtype=np.int64) - starts.repeat(sizes)
    alt = np.where(turn_idx % 2 == 0, "user", "assistant")
    rand_roles = np.array(ROLES, dtype=object)[rng.integers(0, len(ROLES), total)]
    roles = np.where(rng.random(total) < 0.8, alt, rand_roles).astype(object)
    r = rng.random(total)
    pool_idx = rng.integers(0, POOL_SIZE, total)
    text = np.empty(total, dtype=object)
    m_html = r < 0.40
    m_pdf = (r >= 0.40) & (r < 0.70)
    m_plain = r >= 0.70
    text[m_html] = pools["html"][pool_idx[m_html]]
    text[m_pdf] = pools["pdf"][pool_idx[m_pdf]]
    text[m_plain] = pools["plain"][pool_idx[m_plain]]
    tools_arr = np.array(TOOLS, dtype=object)[rng.integers(0, len(TOOLS), total)]
    tool = np.where(roles == "tool", tools_arr, None).astype(object)
    pdf = pd.DataFrame(
        {
            "conv_id": conv_ids,
            "turn_idx": turn_idx.astype("int32"),
            "role": roles,
            "text": text,
            "tool": tool,
        }
    )
    conv_codes = pdf["conv_id"].astype("category").cat.codes.astype("int64")
    pdf["ts"] = pd.Timestamp(_EPOCH) + pd.to_timedelta(
        (part_idx * convs_per_part + conv_codes) * 3600
        + pdf["turn_idx"].astype("int64"),
        unit="s",
    )
    pdf["ts"] = pdf["ts"].dt.tz_convert(None)
    return pdf


def write_transcripts_parquet(path: str, n_convs: int, seed: int = 7,
                              rows_per_file: int = 100_000) -> int:
    """Write the synthetic table as a multi-file parquet directory (so Spark
    gets input splits without repartitioning). Returns row count."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import os

    pdf = generate_transcripts_pdf(n_convs, seed)
    os.makedirs(path, exist_ok=True)
    schema = pa.schema([
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()),
        pa.field("text", pa.string()),
        pa.field("tool", pa.string()),
        pa.field("ts", pa.timestamp("us")),
    ])
    table = pa.Table.from_pandas(pdf, schema=schema, preserve_index=False)
    n = table.num_rows
    i = 0
    for start in range(0, n, rows_per_file):
        pq.write_table(table.slice(start, rows_per_file),
                       os.path.join(path, f"part-{i:05d}.parquet"))
        i += 1
    return n
