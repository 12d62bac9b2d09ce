"""LLM-training-data pipeline operators (beyond the Hive reference surface).

Modules:
  - text: tokenization, quality scoring, language ID, winnowing/fingerprints,
    n-grams (+top-n-gram dominance), chunking/packing, diversity,
    normalization, PII scrub
  - dedup: exact (+keep-best/prefix/chunk), chunk-removal transform,
    MinHash+LSH (self + incremental cross-corpus), SimHash, n-gram
    Jaccard, substring containment, FastSS deletion-neighborhood fuzzy
    term matching
  - similarity: embedding cosine top-k (brute force, LSH, IVF, int8
    quantized, two-stage rerank, product-quantization ADC), dup pairs,
    anchors/centroids/kNN, norm outliers, distributed exact-int Lloyd
    k-means
  - curation: decontamination (broadcast n-grams + Bloom-bitmap variant),
    connected components (label-prop + Kiveris star), sampling
    (stratified/weighted/cap/contrastive), snapshot diff, balanced
    shards, temperature epoch planning + md5-rounded realization
  - retrieval: TF-IDF, BM25, vocab stats (+capped-vocab OOV rate),
    block-encoded posting lists, bigram LM (self + held-out), DSIR
    importance weights, BPE pair counts + merge-step accounting +
    iterated training, feature hashing, reciprocal-rank fusion
  - multimodal: binary-column plumbing (Codec seam, metadata structs)
  - media_codecs / jpeg: REAL from-spec still-image + audio codecs
    (PNG/BMP/WAV/GIF incl. animated, baseline T.81 JPEG decode)
  - avi / mp4: video containers (RIFF-AVI and ISO BMFF) — mux/demux,
    DIB+MJPEG frame decode, seek-based metadata probes
  - video_source: distributed frame indexing + ranged-read extraction
  - image_dedup: dHash perceptual near-dedup (banded pigeonhole join)
  - flac / audio_containers: full FLAC decode (MD5-verified) + MP3/OGG
    audits
  - tiff: baseline TIFF (PackBits/LZW-decode, ImageIO cross-parity)
  - warc / documents: WARC + HTML→text, DOCX/EPUB/PDF extraction
  - webdataset / tfrecord: tar-shard + TFRecord/Example exchange formats
  - subtitles: SRT/WebVTT parsing + time-overlap cue alignment
  - exif: JPEG EXIF audit (GPS = PII flag) + transcoding-free strip
  - crawl_governance: charset chain, page policy audit, RFC 9309 robots

All operators are DataFrame→DataFrame transforms built from JVM-side
expressions (no Python row loops); where Python is unavoidable the batch path
is Arrow-vectorized (mapInPandas). Each is designed for 100 TB: shuffles are
on salted/banded keys, candidate generation is sub-quadratic, and the only
cross-joins are against broadcast-sized query sets.
"""
