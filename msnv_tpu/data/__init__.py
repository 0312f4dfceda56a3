from msnv_tpu.data.wavio import read_wav, write_wav
from msnv_tpu.data.corpus import build_corpus, load_corpus, CorpusConfig
from msnv_tpu.data.loader import ChunkLoader
