from .curate_stream import (batch_union_equals_offline,
                            run_curation_stream_on_dir,
                            run_curation_stream_with_dedup_on_dir)
from .dedup_stream import (dedup_stream, dedup_stream_bounded,
                           run_dedup_stream_on_dir)
from .checks_stream import run_checks_stream_on_dir
from .detect_stream import detect_stream, run_stream_on_dir
from .dhash_stream import (dhash_dedup_stream, dhash_pairs_store,
                           run_dhash_stream_on_dir)
from .drift_stream import run_drift_stream_on_dir
from .media_stream import (audio_dedup_stream, audio_pairs_store,
                           run_audio_stream_on_dir, run_video_stream_on_dir,
                           video_dedup_stream, video_pairs_store)
from .minhash_stream import (minhash_dedup_stream, minhash_groups_store,
                             minhash_increment, minhash_pairs_store,
                             run_minhash_stream_on_dir)
from .resample_stream import resample_stream, run_resample_stream_on_dir
from .sketch_stream import (bottomk_sketch_store, hll_sketch_store,
                            kll_sketch_store, mg_sketch_store,
                            run_sketch_stream_on_dir, sketch_ingest)
from .semantic_stream import (run_semantic_stream_on_dir,
                              semantic_dedup_stream, semantic_groups_store,
                              semantic_pairs_store)
from .session_stream import run_session_stream_on_dir
from .span_stream import (run_span_gram_stream_on_dir, span_gram_stream,
                          strip_spans_with_store)

__all__ = ["audio_dedup_stream", "audio_pairs_store",
           "batch_union_equals_offline", "dedup_stream",
           "run_checks_stream_on_dir",
           "dedup_stream_bounded", "detect_stream",
           "dhash_dedup_stream", "dhash_pairs_store",
           "run_audio_stream_on_dir", "run_dhash_stream_on_dir",
           "run_video_stream_on_dir",
           "video_dedup_stream", "video_pairs_store",
           "minhash_dedup_stream", "minhash_groups_store",
           "minhash_increment",
           "minhash_pairs_store", "resample_stream",
           "run_curation_stream_on_dir",
           "run_curation_stream_with_dedup_on_dir",
           "run_dedup_stream_on_dir", "run_drift_stream_on_dir",
           "run_minhash_stream_on_dir", "run_resample_stream_on_dir",
           "run_semantic_stream_on_dir", "run_session_stream_on_dir",
           "bottomk_sketch_store", "hll_sketch_store", "kll_sketch_store",
           "mg_sketch_store",
           "run_sketch_stream_on_dir", "sketch_ingest",
           "run_span_gram_stream_on_dir", "run_stream_on_dir",
           "semantic_dedup_stream", "semantic_groups_store",
           "semantic_pairs_store", "span_gram_stream",
           "strip_spans_with_store"]
