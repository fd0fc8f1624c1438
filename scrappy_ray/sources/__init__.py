from .testgen import SynthWebConfig, make_page_batch, generate_table, generate_parquet, synth_kb_yaml, seed_urls

__all__ = [
    "SynthWebConfig",
    "make_page_batch",
    "generate_table",
    "generate_parquet",
    "synth_kb_yaml",
    "seed_urls",
]
