"""Unit tests for utils: tokenizer (BPE with real files + fallback),
config, prompts, model-arch dump/diff, election."""


from mixdq_tpu.utils import prompts as prompts_mod
from mixdq_tpu.utils.config import Config, load_config, merge, save_config
from mixdq_tpu.utils.tokenizer import CLIPTokenizer, HashTokenizer, load_tokenizer


def test_hash_tokenizer_shapes():
    tok = HashTokenizer(vocab_size=100)
    ids = tok(["hello world", ""])
    assert ids.shape == (2, 77)
    assert ids[0, 0] == 98  # BOS
    assert (ids[1, 1:] == 99).all()  # EOS padding


def test_clip_bpe_tokenizer_with_tiny_vocab(tmp_path):
    """Exercise the real BPE machinery with a constructed vocab."""
    import json

    # byte-level alphabet + a couple of merges
    from mixdq_tpu.utils.tokenizer import bytes_to_unicode

    alphabet = list(bytes_to_unicode().values())
    vocab = {ch: i for i, ch in enumerate(alphabet)}
    base = len(vocab)
    for i, tok in enumerate(["h e", "he l", "hel l", "hell o</w>", "lo</w>"]):
        vocab["".join(tok.split())] = base + i
    for ch in alphabet:
        vocab.setdefault(ch + "</w>", len(vocab))
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text(
        "#version: 0.2\nh e\nhe l\nhel l\nhell o</w>\nl o</w>\n")

    tok = CLIPTokenizer(str(tmp_path / "vocab.json"),
                        str(tmp_path / "merges.txt"))
    ids = tok(["hello"])
    assert ids.shape == (1, 77)
    assert ids[0, 0] == tok.bos_token_id
    assert ids[0, 1] == vocab["hello</w>"]  # fully merged
    assert ids[0, 2] == tok.eos_token_id

    # load_tokenizer picks the real one when files exist
    t2 = load_tokenizer(str(tmp_path))
    assert isinstance(t2, CLIPTokenizer)
    assert isinstance(load_tokenizer(None), HashTokenizer)


def test_config_roundtrip(tmp_path):
    cfg = Config({"a": {"b": 1}, "c": [1, 2]})
    assert cfg.a.b == 1
    assert cfg.get("missing", 5) == 5
    p = str(tmp_path / "c.yaml")
    save_config(cfg, p)
    back = load_config(p)
    assert back.a.b == 1
    merged = merge(back, {"a": {"b": 2}, "d": 3})
    assert merged.a.b == 2 and merged.d == 3 and merged.c == [1, 2]


def test_prompts_loaders(tmp_path):
    assert len(prompts_mod.load_prompts(None, 5)) == 5
    assert len(prompts_mod.load_prompts(None, 100)) == 100  # cycled
    f = tmp_path / "p.txt"
    f.write_text("a\nb\n\nc\n")
    assert prompts_mod.load_prompts(str(f)) == ["a", "b", "c"]
    import json

    j = tmp_path / "coco.json"
    j.write_text(json.dumps({"annotations": [{"caption": "x"},
                                             {"caption": "y"}]}))
    assert prompts_mod.load_prompts(str(j)) == ["x", "y"]


def test_model_arch_dump_and_diff():
    from mixdq_tpu.analysis import model_arch

    a = "l1: (3, 4)\nl2: (5, 6)\n"
    b = "l1: (3, 4)\nl2: (5, 7)\nl3: (1,)\n"
    d = model_arch.compare_structures(a, b)
    assert d["only_b"] == ["l3"]
    assert d["shape_mismatch"] == ["l2"]
    assert d["only_a"] == []
