#!/usr/bin/env python3
"""Freeze expected outputs for operators whose results are not SQL-derivable
(scala cell encoders, the synthetic image codec, the OMA fixture pipeline)
into DuckDB VALUES literals -> src/main/scala/graft/operators/FrozenOracles.scala.

SCALE-PARAMETERIZED: scale-dependent queries are frozen once per scale
directory, branched at query time on COUNT(*) FROM documents (the outputs
derive from doc_id alone, and the doc_id set is a function of the row
count). A gate run at an unfrozen scale returns ZERO rows -> loud failure
instead of a silently-stale table. Input-independent fixture queries
(oma_pipeline / oma_reunify) stay single-branch.

Run AFTER Verify dumps at every scale to freeze:
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
  sbt -batch "runMain graft.Verify /root/testdata/sf0.1  /tmp/verify_sf01"
  python3 tools/freeze_oracles.py /root/testdata/sf0.01:/tmp/verify_out \
      /root/testdata/sf0.1:/tmp/verify_sf01
"""
import sys
import duckdb

pairs = [a.split(":", 1) for a in sys.argv[1:]] or [
    ["/root/testdata/sf0.01", "/tmp/verify_out"],
    ["/root/testdata/sf0.1", "/tmp/verify_sf01"],
]

# (query name, scala val, scale-dependent?, ordered (col, duck type) pairs)
SPECS = [
    ("g_cell_hex", "gCellHex", True, [("cell", "BIGINT"), ("n", "BIGINT")]),
    ("g_cell_hilbert", "gCellHilbert", True, [("cell", "BIGINT"), ("n", "BIGINT")]),
    ("m_img_resize", "mImgResize", True,
     [("image_id", "VARCHAR"), ("rw", "BIGINT"), ("rh", "BIGINT"), ("mean_luma", "BIGINT")]),
    ("m_img_invariant", "mImgInvariant", True,
     [("image_id", "VARCHAR"), ("mean_luma", "BIGINT"), ("psnr_ok", "VARCHAR"),
      ("lossless_exact", "VARCHAR")]),
    ("m_tile_raster", "mTileRaster", True,
     [("tile", "BIGINT"), ("n_images", "BIGINT"), ("sum_luma", "BIGINT"),
      ("min_luma", "BIGINT"), ("max_luma", "BIGINT")]),
    ("m_mosaic_pyramid", "mMosaicPyramid", True,
     [("z", "BIGINT"), ("cx", "BIGINT"), ("cy", "BIGINT"),
      ("n_images", "BIGINT"), ("sum_luma", "BIGINT")]),
    ("m_audio_window", "mAudioWindow", True,
     [("audio_id", "VARCHAR"), ("n_frames", "BIGINT"), ("mean_ms", "BIGINT"),
      ("peak_ms", "BIGINT"), ("snr_ok", "VARCHAR"), ("lossless_exact", "VARCHAR")]),
    ("m_audio_resample", "mAudioResample", True,
     [("audio_id", "VARCHAR"), ("r_sr", "BIGINT"), ("r_n", "BIGINT"), ("sum_s", "BIGINT")]),
    ("oma_pipeline", "omaPipeline", False,
     [("chunk", "BIGINT"), ("ctype", "VARCHAR"), ("n_blocks", "BIGINT"),
      ("n_slices", "BIGINT"), ("n_elements", "BIGINT")]),
    ("oma_reunify", "omaReunify", False,
     [("kind", "VARCHAR"), ("n", "BIGINT"), ("n_vertices", "BIGINT"),
      ("n_backlinks", "BIGINT")]),
]

con = duckdb.connect()

scales = []  # (doc_count, out_dir)
for sf_dir, out_dir in pairs:
    c = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{sf_dir}/documents.parquet')").fetchone()[0]
    if c not in [s[0] for s in scales]:
        scales.append((c, out_dir))


def sql_lit(v, t):
    if t == "VARCHAR":
        return "'" + str(v).replace("'", "''") + "'"
    return str(int(v))


def values_rows(out_dir, name, cols):
    order = ", ".join(c for c, _ in cols)
    df = con.execute(
        f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet') ORDER BY {order}"
    ).fetch_df()
    assert list(df.columns) == [c for c, _ in cols], (name, list(df.columns))
    return ["(" + ", ".join(sql_lit(r[c], t) for c, t in cols) + ")"
            for _, r in df.iterrows()]


def chunk_strings(sql):
    """split into Scala string-literal chunks < constant-pool limit"""
    chunks, cur, cur_len = [], [], 0
    for piece in sql.split("\n"):
        cur.append(piece)
        cur_len += len(piece) + 1
        if cur_len > 40000:
            chunks.append("\n".join(cur))
            cur, cur_len = [], 0
    if cur:
        chunks.append("\n".join(cur))
    return chunks


def escape(s):
    return s.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")


chunks_out = []
total_rows = {}
for name, val, scaled, cols in SPECS:
    colnames = ", ".join(c for c, _ in cols)
    casts = ", ".join(f"CAST({c} AS {t}) AS {c}" for c, t in cols)
    order = colnames
    if scaled:
        branches = []
        counts = []
        for c, out_dir in scales:
            rows = values_rows(out_dir, name, cols)
            counts.append(f"{c}:{len(rows)}")
            branches.append(
                f"SELECT {casts} FROM (VALUES \n" + ",\n".join(rows) +
                f"\n) t({colnames}) WHERE (SELECT COUNT(*) FROM documents) = {c}")
        sql = ("WITH _ AS (SELECT 1)\n" +
               "\nUNION ALL\n".join(branches) +
               f"\nORDER BY {order}")
        total_rows[name] = ", ".join(counts)
    else:
        rows = values_rows(scales[0][1], name, cols)
        total_rows[name] = str(len(rows))
        sql = (f"SELECT {casts} FROM (VALUES \n" + ",\n".join(rows) +
               f"\n) t({colnames}) ORDER BY {order}")
    # Seq(...).mkString: scalac constant-folds literal "+" into a single
    # (64KB-limited) constant, mkString it cannot
    parts = [f'"{escape(c)}"' for c in chunk_strings(sql)]
    joined = ",\n    ".join(parts)
    scala = (f"  val {val}: String = // rows per doc-count branch: {total_rows[name]}\n"
             f"    Seq(\n    {joined}).mkString(\"\\n\")")
    chunks_out.append(scala)

header = '''package graft.operators

/** Frozen expected outputs (DuckDB VALUES literals) for operators whose
  * results are not SQL-derivable: the scala cell encoders (trig + Hilbert
  * curve), the synthetic image codec (md5-chain pixels), and the OMA
  * fixture pipeline. Scale-dependent queries carry one VALUES branch per
  * frozen scale, selected at query time on COUNT(*) FROM documents (their
  * outputs are functions of the doc_id set alone); a run at an unfrozen
  * scale returns zero rows and fails the gate loudly. Input-independent
  * fixture queries (oma_*) are single-branch. Independently cross-checked
  * by CellsSpec / MultimodalSpec / OmaGoldenSpec (the latter diffs against
  * the reference oma.jar).
  *
  * GENERATED by tools/freeze_oracles.py — regenerate after an intentional
  * encoder change, never edit by hand.
  */
object FrozenOracles {

'''
src = header + "\n\n".join(chunks_out) + "\n}\n"
path = "src/main/scala/graft/operators/FrozenOracles.scala"
with open(path, "w") as f:
    f.write(src)
print(f"wrote {path} ({len(src)} bytes), scales: {[s[0] for s in scales]}")
