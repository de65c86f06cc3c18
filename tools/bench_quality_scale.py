#!/usr/bin/env python
"""Retrieval quality at scale: the recall@10-matched half of the north star.

VERDICT r3 #1: every prior quality number (MRR/hit@10 vs relevance targets)
came from 2,000-doc corpora; the 1M scoreboard line is recall-vs-exact only.
This runs the FULL product path on a >=100k-chunk real-text corpus
(`tools/real_corpus.py`) on chip:

  train the dim-128/6-layer encoder on the corpus (the `train --auto`
  recipe: ICT + BM25 hard negatives + synonym augmentation, plateau stop)
  -> embed + int8/binary quantized index (two-stage default)
  -> BM25 CSR index -> fusion="auto" calibration (held-out selection)
  -> 600 paraphrase+ICT queries -> per-leg and hybrid MRR/hit@10 with
  bootstrap confidence intervals (incl. the PAIRED delta hybrid - best leg,
  the number round 3 could not statistically earn) -> hybrid QPS at this N.

Writes `data/quality_scale.json`; `bench.py` lifts it into the driver
scoreboard extras. The reference states its quality-retention claims at 1M
(`/root/reference/docs/BINARY_QUANTIZATION_README.md:130-132`); this is the
equivalent measured statement for this framework, at the largest real-text
corpus this offline environment can produce.

Usage:
  python tools/bench_quality_scale.py --docs 100000 --queries 600 \
      --train-steps 12000 --save-ckpt data/embedder_ckpt
  python tools/bench_quality_scale.py --docs 100000 --load-ckpt data/embedder_ckpt
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import pathlib
import sys
import time

import numpy as np

if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    # sitecustomize registers the axon TPU platform before env vars apply;
    # pin explicitly so a CPU smoke run really stays off the tunnel.
    import jax

    jax.config.update("jax_platforms", "cpu")

logging.basicConfig(level=logging.INFO, stream=sys.stderr,
                    format="%(asctime)s %(name)s: %(message)s")

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

from real_corpus import load_real_corpus  # noqa: E402


def bootstrap_ci(per_query: np.ndarray, n_boot: int = 2000, seed: int = 7):
    """Percentile bootstrap 95% CI for the mean of per-query values."""
    rng = np.random.default_rng(seed)
    n = len(per_query)
    idx = rng.integers(0, n, (n_boot, n))
    means = per_query[idx].mean(axis=1)
    return float(np.percentile(means, 2.5)), float(np.percentile(means, 97.5))


def paired_delta_ci(a: np.ndarray, b: np.ndarray, n_boot: int = 2000,
                    seed: int = 7):
    """Paired bootstrap 95% CI for mean(a - b) over the same queries."""
    rng = np.random.default_rng(seed)
    d = a - b
    idx = rng.integers(0, len(d), (n_boot, len(d)))
    means = d[idx].mean(axis=1)
    return float(np.percentile(means, 2.5)), float(np.percentile(means, 97.5))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=100_000)
    ap.add_argument("--queries", type=int, default=600)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--layers", type=int, default=6)
    ap.add_argument("--top-k", type=int, default=10)
    ap.add_argument("--train-steps", type=int, default=12_000,
                    help="ceiling; accuracy-plateau auto-stop applies")
    ap.add_argument("--train-batch", type=int, default=256,
                    help="contrastive batch (in-batch negatives scale with it)")
    ap.add_argument("--min-steps", type=int, default=4000)
    ap.add_argument("--plateau-window", type=int, default=2500)
    ap.add_argument("--save-ckpt", default="",
                    help="orbax dir for the trained params (ship in data/)")
    ap.add_argument("--load-ckpt", default="", help="skip training")
    ap.add_argument("--use-shipped", action="store_true",
                    help="eval-only: load the shipped npz artifacts "
                         "(radiant_rag_tpu/data/*.npz) for the embedder and "
                         "(with --rerank) the cross-encoder — the exact "
                         "weights a weightless deploy serves with")
    ap.add_argument("--rerank", action="store_true",
                    help="train + evaluate the cross-encoder rerank stage "
                         "(BASELINE config #5) on the same corpus")
    ap.add_argument("--rerank-k", type=int, default=32,
                    help="hybrid candidates fed to the reranker per query")
    ap.add_argument("--ce-steps", type=int, default=12000)
    ap.add_argument("--ce-layers", type=int, default=6)
    ap.add_argument("--ce-dim", type=int, default=128)
    ap.add_argument("--ce-seq-len", type=int, default=128)
    ap.add_argument("--save-ce-ckpt", default="")
    ap.add_argument("--load-ce-ckpt", default="")
    # tracked path: bench.py lifts this into the driver scoreboard — a
    # gitignored location silently produced a quality-free BENCH_r04.json
    ap.add_argument("--out", default="bench_artifacts/quality_scale.json")
    ap.add_argument("--qps-batches", type=int, default=12)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    from radiant_rag_tpu.config import EmbeddingConfig, IndexConfig
    from radiant_rag_tpu.index.bm25 import BM25Index
    from radiant_rag_tpu.index.hybrid import HybridSearcher
    from radiant_rag_tpu.index.store import TpuVectorStore
    from radiant_rag_tpu.models.embedder import Embedder
    from radiant_rag_tpu.models.tokenizer import load_tokenizer
    from radiant_rag_tpu.parallel.data import (
        ContrastivePairSampler, make_paraphrase_query, make_pseudo_query,
        paraphrase_augment, train_embedder,
    )
    from radiant_rag_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(args.seed)
    t_all = time.time()

    texts = load_real_corpus(args.docs)
    n = len(texts)
    print(f"corpus: {n} real-text chunks", file=sys.stderr)

    emb_cfg = EmbeddingConfig(
        preset="none", dim=args.dim, num_layers=args.layers, num_heads=4,
        hidden_dim=args.dim * 2, vocab_size=8192, max_seq_len=64,
        batch_size=1024, checkpoint_dir="")

    # BM25 over synthetic row ids 0..n-1: used for hard-negative mining at
    # train time AND (rebound to store rows, which land identically 0..n-1
    # on a fresh insertion-ordered store) for the hybrid leg.
    t0 = time.time()
    bm25 = BM25Index(sketch_dim=1024)
    bm25.bulk_build(list(range(n)), texts)
    t_bm25 = time.time() - t0
    print(f"bm25 built in {t_bm25:.1f}s", file=sys.stderr)

    train_info = {}
    if args.use_shipped:
        import jax.numpy as jnp

        from radiant_rag_tpu.models.bert import BertConfig, init_params
        from radiant_rag_tpu.models.pretrained import shipped_embedder_params

        bert_cfg = BertConfig(  # mirror Embedder.__init__'s mapping
            vocab_size=emb_cfg.vocab_size, hidden_size=emb_cfg.dim,
            num_layers=emb_cfg.num_layers, num_heads=emb_cfg.num_heads,
            intermediate_size=emb_cfg.hidden_dim,
            dtype=jnp.bfloat16 if emb_cfg.dtype == "bfloat16" else jnp.float32)
        params = shipped_embedder_params(bert_cfg, init_params(bert_cfg, seed=0))
        if params is None:
            sys.exit("--use-shipped: no shipped embedder npz matches "
                     f"dim={args.dim} layers={args.layers}")
        train_info = {"loaded": "shipped-npz"}
    elif args.load_ckpt:
        from radiant_rag_tpu.parallel.checkpoint import TrainCheckpointer

        params = TrainCheckpointer(args.load_ckpt).restore()["params"]
        train_info = {"loaded": args.load_ckpt}
    else:
        tokenizer = load_tokenizer("", emb_cfg.vocab_size)
        sampler = ContrastivePairSampler(
            texts, tokenizer, batch_size=args.train_batch,
            max_seq_len=emb_cfg.max_seq_len, seed=args.seed,
            bm25=bm25, rows=list(range(n)), n_hard_negatives=2,
            query_augment=paraphrase_augment)
        t0 = time.time()
        train_info, params = train_embedder(
            None, emb_cfg, steps=args.train_steps, batch_size=args.train_batch,
            learning_rate=1e-4, sampler=sampler, auto_stop=True,
            min_steps=args.min_steps, plateau_window=args.plateau_window,
            plateau_eps=0.005,
            log_every=500, checkpoint_dir=args.save_ckpt, return_params=True)
        train_info["train_s"] = round(time.time() - t0, 1)
        print(f"trained in {train_info['train_s']}s: {train_info}",
              file=sys.stderr)

    embedder = Embedder(emb_cfg, params=params)

    t0 = time.time()
    embs = embedder._compute(texts)  # no cache — one pass, batched on device
    t_embed = time.time() - t0
    print(f"embedded {n} chunks in {t_embed:.1f}s "
          f"({n / max(t_embed, 1e-9):.0f}/s)", file=sys.stderr)

    store = TpuVectorStore(dim=args.dim, index_config=IndexConfig(
        dim=args.dim, initial_capacity=n))
    if hasattr(store, "reserve"):
        store.reserve(n)
    t0 = time.time()
    bs = 8192
    for s in range(0, n, bs):
        store.upsert_batch([(texts[i], {}, embs[i])
                            for i in range(s, min(n, s + bs))])
    t_build = time.time() - t0
    print(f"index built in {t_build:.1f}s", file=sys.stderr)

    # row mapping sanity: fresh insertion-ordered store => rows 0..n-1
    probe_rows = [store.row_of(store.make_doc_id(texts[i], {}))
                  for i in (0, n // 2, n - 1)]
    assert probe_rows == [0, n // 2, n - 1], probe_rows

    searcher = HybridSearcher(store.engine, bm25)
    # product parity: serving fuses the legs at retrieval.fused_depth
    # (auto = 4 x fused_top_k) and truncates on device — measure the same
    # path here (calibration below inherits it too, as in production)
    searcher.default_fused_depth = 4 * args.top_k

    def text_of(row: int):
        return texts[row] if 0 <= row < n else None

    t0 = time.time()
    searcher.calibrate_fusion(embedder.embed, text_of, seeds=2)
    t_cal = time.time() - t0
    cal = searcher.last_calibration
    print(f"calibration ({t_cal:.1f}s): {json.dumps(cal)[:400]}", file=sys.stderr)

    # --- evaluation queries: half paraphrase (the semantic-gap regime), half
    # ICT spans (the lexical regime), disjoint targets ---------------------
    tgt = rng.choice(n, args.queries, replace=False)
    q_texts, q_style = [], []
    for j, t in enumerate(tgt):
        if j % 2 == 0:
            q_texts.append(make_paraphrase_query(texts[t], rng, max_words=9))
            q_style.append("paraphrase")
        else:
            q_texts.append(make_pseudo_query(texts[t], rng, max_words=8))
            q_style.append("ict")

    q_embs = embedder.embed(q_texts)
    k = args.top_k
    mode = store._default_mode() if hasattr(store, "_default_mode") else "int8"
    res = searcher.search_rows(np.asarray(q_embs, np.float32), q_texts,
                               dense_k=k, bm25_k=k, fused_k=k, mode=mode,
                               fusion="auto")
    exact = store.retrieve_by_embedding_batch(q_embs, top_k=k, quantized=False)
    exact_rows = [[store.row_of(d.doc_id) for d, _ in exact[qi]]
                  for qi in range(len(q_texts))]

    def per_query_rr(rows_out) -> np.ndarray:
        rr = np.zeros(len(q_texts), np.float64)
        for qi in range(len(q_texts)):
            hits = [int(r) for r in rows_out[qi] if r is not None and r >= 0]
            if int(tgt[qi]) in hits:
                rr[qi] = 1.0 / (hits.index(int(tgt[qi])) + 1)
        return rr

    # shallow-fusion control: the pre-round-4 path (legs fused at k) — the
    # paired delta against hybrid_auto isolates the fused_depth gain
    res_shallow = searcher.search_rows(np.asarray(q_embs, np.float32),
                                       q_texts, dense_k=k, bm25_k=k,
                                       fused_k=k, mode=mode, fusion="auto",
                                       fused_depth=0)
    systems = {
        "dense_exact": per_query_rr(exact_rows),
        "dense_int8_two_stage": per_query_rr(res["dense"][1]),
        "bm25": per_query_rr(res["bm25"][1]),
        "hybrid_auto": per_query_rr(res["fused"][1]),
        "hybrid_fused_at_k": per_query_rr(res_shallow["fused"][1]),
    }
    style = np.asarray(q_style)

    # --- cross-encoder rerank stage (BASELINE config #5) -------------------
    ce_info: dict = {}
    if args.rerank:
        import jax.numpy as jnp

        from radiant_rag_tpu.config import CrossEncoderConfig
        from radiant_rag_tpu.models.bert import BertConfig
        from radiant_rag_tpu.models.cross_encoder import CrossEncoder

        ce_bert = BertConfig(
            vocab_size=8192, hidden_size=args.ce_dim,
            num_layers=args.ce_layers, num_heads=4,
            intermediate_size=args.ce_dim * 2, dtype=jnp.bfloat16)
        if args.use_shipped:
            import jax

            from radiant_rag_tpu.models.cross_encoder import CrossEncoderModel
            from radiant_rag_tpu.models.pretrained import (
                shipped_cross_encoder_params,
            )

            dummy = jnp.zeros((1, 16), jnp.int32)
            template = CrossEncoderModel(ce_bert).init(
                jax.random.PRNGKey(0), dummy, jnp.ones((1, 16), jnp.int32),
                dummy)
            ce_params = shipped_cross_encoder_params(ce_bert, template)
            if ce_params is None:
                sys.exit("--use-shipped: no shipped cross-encoder npz matches "
                         f"dim={args.ce_dim} layers={args.ce_layers}")
            ce_info = {"loaded": "shipped-npz"}
        elif args.load_ce_ckpt:
            from radiant_rag_tpu.parallel.checkpoint import TrainCheckpointer

            ce_params = TrainCheckpointer(args.load_ce_ckpt).restore()["params"]
            ce_info = {"loaded": args.load_ce_ckpt}
        else:
            from radiant_rag_tpu.parallel.data import train_cross_encoder

            t0 = time.time()
            # listwise over G=8 blocks: 1 positive + 5 BM25 hard negatives
            # (the rerank candidate distribution) + 2 random
            ce_info, ce_params = train_cross_encoder(
                texts, bert_cfg=ce_bert, steps=args.ce_steps, batch_size=256,
                max_seq_len=args.ce_seq_len, bm25=bm25, rows=list(range(n)),
                hard_negatives=5, random_negatives=2,
                query_augment=paraphrase_augment, auto_stop=True,
                min_steps=max(2000, args.ce_steps * 2 // 3),
                plateau_window=3000, plateau_eps=0.005,
                log_every=500, checkpoint_dir=args.save_ce_ckpt,
                return_params=True, seed=args.seed)
            ce_info["train_s"] = round(time.time() - t0, 1)
            print(f"cross-encoder trained in {ce_info['train_s']}s: {ce_info}",
                  file=sys.stderr)
        ce = CrossEncoder(
            config=CrossEncoderConfig(max_seq_len=args.ce_seq_len,
                                      batch_size=512),
            bert_cfg=ce_bert, params=ce_params)

        from radiant_rag_tpu.models.device_rerank import DeviceReranker

        rr = DeviceReranker(ce, pair_chunk=8192)
        t0 = time.time()
        rr.build_table(texts)
        print(f"rerank token table: {time.time()-t0:.1f}s", file=sys.stderr)

        def wide_search(qs_text, qs_emb):
            res_w = searcher.search_rows(
                np.asarray(qs_emb, np.float32), qs_text,
                dense_k=args.rerank_k, bm25_k=args.rerank_k,
                fused_k=args.rerank_k, mode=mode, fusion="auto")
            return res_w["fused"]

        # --- probe-calibrated blend weight: final order = z(CE) + w*z(prior)
        # (w selected on self-labeled pseudo-query probes; w=inf degenerates
        # to the incoming hybrid order, so the stage cannot lose) -----------
        n_probes = 256
        ptgt = rng.choice(n, n_probes, replace=False)
        p_texts = []
        for j, t in enumerate(ptgt):
            mk = make_paraphrase_query if j % 2 == 0 else make_pseudo_query
            p_texts.append(mk(texts[t], rng))
        p_embs = embedder.embed(p_texts)
        p_scores, p_rows = wide_search(p_texts, p_embs)
        weights = [0.0, 0.25, 0.5, 1.0, 2.0, 1e6]
        probe_mrr = {}
        for w in weights:
            _s, rr_rows = rr.rerank_rows(p_texts, p_rows, top_k=k,
                                         prior_scores=p_scores, prior_weight=w)
            rrr = np.zeros(n_probes)
            for qi in range(n_probes):
                hits = [int(r) for r in rr_rows[qi] if r >= 0]
                if int(ptgt[qi]) in hits:
                    rrr[qi] = 1.0 / (hits.index(int(ptgt[qi])) + 1)
            probe_mrr[w] = float(rrr.mean())
        blend_w = max(weights, key=lambda w: probe_mrr[w])
        ce_info["blend_weight"] = blend_w
        ce_info["blend_probe_mrr"] = {str(w): round(v, 4)
                                      for w, v in probe_mrr.items()}
        print(f"blend weight: {blend_w} (probe MRRs {ce_info['blend_probe_mrr']})",
              file=sys.stderr)

        # --- eval: rerank the hybrid top-rerank_k with the selected blend --
        wide_scores, wide_rows = wide_search(q_texts, q_embs)
        # decomposition control: the same depth-rerank_k fused pool truncated
        # to top-k in pure prior order — separates the "deeper fusion pool"
        # gain from genuine CE reordering in the rerank deltas below
        systems["hybrid_wide_trunc"] = per_query_rr(
            np.asarray(wide_rows)[:, :k])
        t0 = time.time()
        _s, rerank_rows = rr.rerank_rows(q_texts, wide_rows, top_k=k,
                                         prior_scores=wide_scores,
                                         prior_weight=blend_w)
        t_rerank = time.time() - t0
        systems["hybrid_rerank"] = per_query_rr(rerank_rows)
        ce_info["rerank_ms_per_query"] = round(1000 * t_rerank / len(q_texts), 2)
        ce_info["pairs_per_s"] = round(
            len(q_texts) * args.rerank_k / t_rerank, 1)
        ce_info["rerank_k"] = args.rerank_k
        ce_info["dim"] = args.ce_dim
        ce_info["layers"] = args.ce_layers
        print(f"rerank: {ce_info['rerank_ms_per_query']} ms/query "
              f"({ce_info['pairs_per_s']} pairs/s)", file=sys.stderr)

    def summarize(rr: np.ndarray, sel=None) -> dict:
        x = rr if sel is None else rr[sel]
        lo, hi = bootstrap_ci(x)
        return {"mrr": round(float(x.mean()), 4),
                "mrr_ci95": [round(lo, 4), round(hi, 4)],
                "hit@10": round(float((x > 0).mean()), 4),
                "n": int(len(x))}

    report_systems = {}
    for name, rr in systems.items():
        report_systems[name] = {
            "all": summarize(rr),
            "paraphrase": summarize(rr, style == "paraphrase"),
            "ict": summarize(rr, style == "ict"),
        }

    # the headline deltas, paired per query
    best_leg = max(("dense_int8_two_stage", "bm25"),
                   key=lambda s: systems[s].mean())
    deltas = {}

    def add_delta(a: str, b: str) -> None:
        lo, hi = paired_delta_ci(systems[a], systems[b])
        # hit@10 is the "recall@10-matched" metric of the SURVEY §6 north
        # star — report its paired delta alongside MRR's
        ha, hb = (systems[a] > 0).astype(np.float64), (systems[b] > 0).astype(np.float64)
        hlo, hhi = paired_delta_ci(ha, hb)
        deltas[f"{a}_minus_{b}"] = {
            "mean": round(float((systems[a] - systems[b]).mean()), 4),
            "ci95": [round(lo, 4), round(hi, 4)],
            "hit@10_mean": round(float((ha - hb).mean()), 4),
            "hit@10_ci95": [round(hlo, 4), round(hhi, 4)],
        }

    add_delta("hybrid_auto", "bm25")
    add_delta("hybrid_auto", "dense_int8_two_stage")
    add_delta("hybrid_auto", "hybrid_fused_at_k")
    if "hybrid_rerank" in systems:
        add_delta("hybrid_rerank", best_leg)
        add_delta("hybrid_rerank", "hybrid_auto")
        add_delta("hybrid_wide_trunc", "hybrid_auto")
        add_delta("hybrid_rerank", "hybrid_wide_trunc")

    # --- QPS at this N, the calibrated production path --------------------
    bq = min(1024, store.engine.max_query_bucket())
    tile = (q_texts * ((bq // len(q_texts)) + 1))[:bq]
    tile_embs = embedder.embed(tile)
    searcher.search_rows(np.asarray(tile_embs, np.float32), tile,
                         dense_k=k, bm25_k=k, fused_k=k, mode=mode,
                         fusion="auto")  # warm
    t0 = time.time()
    for _ in range(args.qps_batches):
        searcher.search_rows(np.asarray(tile_embs, np.float32), tile,
                             dense_k=k, bm25_k=k, fused_k=k, mode=mode,
                             fusion="auto")
    dt = time.time() - t0
    qps = args.qps_batches * bq / dt

    report = {
        "metric": "quality_at_scale",
        "docs": n, "queries": len(q_texts), "top_k": k,
        "corpus": "real-text offline (site-packages+stdlib+reference docs/"
                  "docstrings/comments)",
        "encoder": {"dim": args.dim, "layers": args.layers,
                    "trained": train_info},
        "dense_mode": mode,
        "fusion_calibration": cal,
        "systems": report_systems,
        "paired_deltas_mrr": deltas,
        "best_single_leg": best_leg,
        "hybrid_beats_best_leg": bool(
            deltas[f"hybrid_auto_minus_{best_leg}"]["mean"] > 0),
        "delta_ci_excludes_zero": bool(
            deltas[f"hybrid_auto_minus_{best_leg}"]["ci95"][0] > 0),
        "hit10_delta_ci_excludes_zero": bool(
            deltas[f"hybrid_auto_minus_{best_leg}"]["hit@10_ci95"][0] > 0),
        **({"cross_encoder": ce_info,
            "rerank_beats_best_leg": bool(
                deltas[f"hybrid_rerank_minus_{best_leg}"]["mean"] > 0),
            "rerank_delta_ci_excludes_zero": bool(
                deltas[f"hybrid_rerank_minus_{best_leg}"]["ci95"][0] > 0)}
           if "hybrid_rerank" in systems else {}),
        "qps": round(qps, 1), "qps_batch": bq,
        "timings_s": {"bm25_build": round(t_bm25, 1),
                      "embed": round(t_embed, 1),
                      "index_build": round(t_build, 1),
                      "calibration": round(t_cal, 1),
                      "total": round(time.time() - t_all, 1)},
        "device": _device_kind(),
    }
    out = pathlib.Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=2))
    print(json.dumps(report, indent=2))
    return 0


def _device_kind() -> str:
    try:
        import jax

        return jax.devices()[0].device_kind
    except Exception:
        return "unknown"


if __name__ == "__main__":
    sys.exit(main())
