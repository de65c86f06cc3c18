"""Image captioner (ingestion/image_captioner.py): the local-VLM path runs a
REAL transformers VisionEncoderDecoder built in-test (tiny random ViT->GPT2,
zero network) through create_captioner's checkpoint-dir discovery — closing
the round-1 'VLM path never exercisable' gap. Reference parity:
`ingestion/image_captioner.py:148-597`."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
PIL = pytest.importorskip("PIL")

from radiant_rag_tpu.ingestion.image_captioner import (
    HuggingFaceVLMCaptioner,
    MetadataCaptioner,
    create_captioner,
)


@pytest.fixture(scope="module")
def vlm_dir(tmp_path_factory):
    """Tiny VisionEncoderDecoder checkpoint saved to disk."""
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace
    from transformers import (GPT2Config, PreTrainedTokenizerFast,
                              ViTConfig, ViTImageProcessor,
                              VisionEncoderDecoderConfig,
                              VisionEncoderDecoderModel)

    d = tmp_path_factory.mktemp("vlm")
    vit = ViTConfig(hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
                    intermediate_size=64, image_size=32, patch_size=16)
    gpt = GPT2Config(vocab_size=50, n_embd=32, n_layer=1, n_head=2,
                     n_positions=32, add_cross_attention=True, is_decoder=True,
                     bos_token_id=0, eos_token_id=1, pad_token_id=1)
    cfg = VisionEncoderDecoderConfig.from_encoder_decoder_configs(vit, gpt)
    cfg.decoder_start_token_id = 0
    cfg.pad_token_id = 1
    torch.manual_seed(0)
    VisionEncoderDecoderModel(cfg).eval().save_pretrained(str(d))
    ViTImageProcessor(size={"height": 32, "width": 32}).save_pretrained(str(d))
    vocab = {f"tok{i}": i for i in range(50)}
    tok = Tokenizer(WordLevel(vocab, unk_token="tok0"))
    tok.pre_tokenizer = Whitespace()
    PreTrainedTokenizerFast(tokenizer_object=tok, bos_token="tok0",
                            eos_token="tok1", pad_token="tok1").save_pretrained(str(d))
    return str(d)


@pytest.fixture()
def image_path(tmp_path):
    from PIL import Image

    arr = (np.random.default_rng(0).random((32, 32, 3)) * 255).astype("uint8")
    p = tmp_path / "sunset_over_lake.png"
    Image.fromarray(arr).save(p)
    return str(p)


def test_vlm_captioner_end_to_end(vlm_dir, image_path):
    cap = create_captioner(vlm_dir)
    assert isinstance(cap, HuggingFaceVLMCaptioner)  # picker chose the VLM
    out = cap.caption(image_path)
    assert isinstance(out, str)
    # tiny random model emits tokens from its vocab (or empty on instant EOS)
    for w in out.split():
        assert w.startswith("tok")


def test_picker_falls_back_without_checkpoint(tmp_path, image_path):
    cap = create_captioner(str(tmp_path / "missing"))
    assert isinstance(cap, MetadataCaptioner)
    out = cap.caption(image_path)
    assert "sunset over lake" in out
    assert "32x32" in out  # PIL metadata present in this environment


def test_metadata_captioner_survives_nonimage(tmp_path):
    p = tmp_path / "not_an_image.png"
    p.write_text("junk")
    out = MetadataCaptioner().caption(str(p))
    assert "not an image" in out  # filename text still produced
