"""Qwen2-VL parity vs HuggingFace transformers (vision tower, mrope
positions, full multimodal prefill + decode). Mirrors the reference's
HfRunner comparisons for its forked Qwen-VL models
(vllm_metax/models/qwen2_vl.py)."""

import numpy as np
import pytest
import jax.numpy as jnp

import tests.utils as tu
from vllm_metax_tpu.config import ModelConfig
from vllm_metax_tpu.models.registry import get_model

IMG_TOK, VID_TOK, VSTART = 7, 8, 9
GRID = (1, 4, 4)  # t, h, w → 16 patches → 4 merged tokens


def _make_hf_model(tmp_path):
    import torch
    from transformers import Qwen2VLConfig, Qwen2VLForConditionalGeneration

    cfg = Qwen2VLConfig(
        text_config=dict(
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            vocab_size=512,
            max_position_embeddings=256,
            rope_theta=10000.0,
            rope_scaling=dict(type="mrope", mrope_section=[2, 3, 3]),
            tie_word_embeddings=False,
        ),
        vision_config=dict(
            depth=2,
            embed_dim=32,
            num_heads=2,
            hidden_size=64,
            in_channels=3,
            patch_size=4,
            temporal_patch_size=2,
            spatial_merge_size=2,
            mlp_ratio=2,
            hidden_act="quick_gelu",
        ),
        image_token_id=IMG_TOK,
        video_token_id=VID_TOK,
        vision_start_token_id=VSTART,
    )
    torch.manual_seed(0)
    model = Qwen2VLForConditionalGeneration(cfg).eval()
    path = str(tmp_path / "tiny_qwen2vl")
    model.save_pretrained(path, safe_serialization=True)
    return model, path


def _pixels(rng, grid):
    t, h, w = grid
    return rng.standard_normal((t * h * w, 3 * 2 * 4 * 4)).astype(np.float32)


def _prompt_ids(rng, vocab, n_img_tokens):
    head = rng.integers(10, vocab, size=5)
    tail = rng.integers(10, vocab, size=6)
    return np.concatenate(
        [head, [VSTART], [IMG_TOK] * n_img_tokens, tail]
    ).astype(np.int64)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    hf, path = _make_hf_model(tmp_path_factory.mktemp("q2vl"))
    cfg = ModelConfig.from_pretrained(path, dtype="float32")
    model = get_model(cfg.architecture)
    params = model.load_weights(cfg, None, path)
    return hf, path, cfg, model, params


def test_config_parse(setup):
    _, _, cfg, model, _ = setup
    assert cfg.architecture == "Qwen2VLForConditionalGeneration"
    assert cfg.hidden_size == 64 and cfg.attention_bias
    assert model.mrope_section(cfg) == (2, 3, 3)
    assert model.image_token_id(cfg) == IMG_TOK


def test_vision_tower_parity(setup):
    import torch

    hf, _, cfg, model, params = setup
    rng = np.random.default_rng(0)
    px = _pixels(rng, GRID)
    with torch.no_grad():
        ref = hf.model.visual(
            torch.tensor(px), grid_thw=torch.tensor([list(GRID)])
        ).numpy()
    ours = np.asarray(model.encode_images(params, px, [GRID], cfg))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_vision_tower_two_images(setup):
    """Two images in one padded batch must not attend across segments."""
    import torch

    hf, _, cfg, model, params = setup
    rng = np.random.default_rng(1)
    g2 = (1, 2, 2)
    px1, px2 = _pixels(rng, GRID), _pixels(rng, g2)
    with torch.no_grad():
        ref = hf.model.visual(
            torch.tensor(np.concatenate([px1, px2])),
            grid_thw=torch.tensor([list(GRID), list(g2)]),
        ).numpy()
    ours = np.asarray(
        model.encode_images(params, np.concatenate([px1, px2]), [GRID, g2], cfg)
    )
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_mrope_positions_match_hf(setup):
    import torch

    hf, _, cfg, model, _ = setup
    rng = np.random.default_rng(2)
    ids = _prompt_ids(rng, 512, 4)
    ref_pos, ref_delta = hf.model.get_rope_index(
        torch.tensor(ids)[None], image_grid_thw=torch.tensor([list(GRID)])
    )
    pos, delta = model.mrope_positions_np(ids, [GRID], cfg)
    np.testing.assert_array_equal(pos, ref_pos[:, 0].numpy())
    assert delta == int(ref_delta[0, 0])


def _build_md(model, cfg, ids, embeds, block_size, max_blocks):
    import dataclasses

    md = tu.make_single_seq_metadata(0, len(ids), block_size, max_blocks)
    mask = ids == IMG_TOK
    mm = np.zeros((len(ids), cfg.hidden_size), np.float32)
    mm[mask] = np.asarray(embeds)
    pos3, delta = model.mrope_positions_np(ids, [GRID], cfg)
    return dataclasses.replace(
        md,
        mm_embeds=jnp.asarray(mm),
        mm_mask=jnp.asarray(mask),
        mrope_positions=jnp.asarray(pos3),
    ), delta


def test_multimodal_prefill_and_decode_parity(setup):
    import torch

    hf, _, cfg, model, params = setup
    rng = np.random.default_rng(3)
    px = _pixels(rng, GRID)
    ids = _prompt_ids(rng, 512, 4)

    with torch.no_grad():
        out = hf(
            input_ids=torch.tensor(ids)[None],
            pixel_values=torch.tensor(px),
            image_grid_thw=torch.tensor([list(GRID)]),
        )
    hf_logits = out.logits[0].numpy()

    block_size, max_blocks = 16, 4
    kv = tu.make_kv_cache_stack(
        cfg.num_hidden_layers, max_blocks, block_size, cfg.num_kv_heads,
        cfg.head_dim,
    )
    embeds = model.encode_images(params, px, [GRID], cfg)
    md, delta = _build_md(model, cfg, ids, embeds, block_size, max_blocks)
    hidden, kv = model.forward(params, jnp.asarray(ids), kv, md, cfg)
    logits = model.compute_logits(params, hidden, cfg)
    np.testing.assert_allclose(
        np.asarray(logits), hf_logits, rtol=3e-4, atol=3e-4
    )

    # greedy decode 4 tokens vs HF generate
    with torch.no_grad():
        gen = hf.generate(
            input_ids=torch.tensor(ids)[None],
            pixel_values=torch.tensor(px),
            image_grid_thw=torch.tensor([list(GRID)]),
            max_new_tokens=4,
            do_sample=False,
        )[0, len(ids):].numpy()

    import dataclasses

    cur = int(np.asarray(logits)[-1].argmax())
    ours = []
    pos = len(ids)
    for _ in range(4):
        ours.append(cur)
        md_d = tu.make_single_seq_metadata(pos, 1, block_size, max_blocks)
        md_d = dataclasses.replace(
            md_d,
            mrope_positions=jnp.full((3, 1), pos + delta, jnp.int32),
        )
        hidden, kv = model.forward(
            params, jnp.asarray([cur], jnp.int32), kv, md_d, cfg
        )
        cur = int(np.asarray(model.compute_logits(params, hidden, cfg))[-1].argmax())
        pos += 1
    np.testing.assert_array_equal(np.asarray(ours), gen)


def test_chunked_multimodal_prefill(setup):
    """Prefill split mid-image must equal one-shot (chunk boundary inside
    the image-token run)."""
    _, _, cfg, model, params = setup
    rng = np.random.default_rng(4)
    px = _pixels(rng, GRID)
    ids = _prompt_ids(rng, 512, 4)
    block_size, max_blocks = 16, 4

    embeds = model.encode_images(params, px, [GRID], cfg)
    md, _ = _build_md(model, cfg, ids, embeds, block_size, max_blocks)
    kv = tu.make_kv_cache_stack(
        cfg.num_hidden_layers, max_blocks, block_size, cfg.num_kv_heads,
        cfg.head_dim,
    )
    full_hidden, _ = model.forward(params, jnp.asarray(ids), kv, md, cfg)

    import dataclasses

    split = 8  # inside the image-token run (5 text + start + 4 img)
    kv = tu.make_kv_cache_stack(
        cfg.num_hidden_layers, max_blocks, block_size, cfg.num_kv_heads,
        cfg.head_dim,
    )
    for a, b in ((0, split), (split, len(ids))):
        md_c = tu.make_single_seq_metadata(a, b - a, block_size, max_blocks)
        md_c = dataclasses.replace(
            md_c,
            mm_embeds=md.mm_embeds[a:b],
            mm_mask=md.mm_mask[a:b],
            mrope_positions=md.mrope_positions[:, a:b],
        )
        hidden, kv = model.forward(params, jnp.asarray(ids[a:b]), kv, md_c, cfg)
    np.testing.assert_allclose(
        np.asarray(hidden),
        np.asarray(full_hidden[split:]),
        rtol=1e-4,
        atol=1e-4,
    )


# ---------------------------------------------------------------------------
# engine e2e


def test_llm_generate_multimodal(setup):
    """Full engine path: LLM.generate with dict prompts (placeholder
    expansion, admission-time vision encode, mrope through single- and
    multi-step decode) vs HF generate. Mixed batch: one image request, one
    text-only request."""
    import torch

    from vllm_metax_tpu import LLM, SamplingParams

    hf, path, cfg, model, params = setup
    rng = np.random.default_rng(5)
    px = _pixels(rng, GRID)
    # single placeholder; the engine expands it to 4 merged tokens
    raw = np.concatenate(
        [rng.integers(10, 512, size=5), [VSTART], [IMG_TOK],
         rng.integers(10, 512, size=6)]
    ).astype(np.int64)
    expanded = np.concatenate(
        [raw[:6], [IMG_TOK] * 4, raw[7:]]
    ).astype(np.int64)
    text_prompt = rng.integers(10, 512, size=9).tolist()

    with torch.no_grad():
        ref_img = hf.generate(
            input_ids=torch.tensor(expanded)[None],
            pixel_values=torch.tensor(px),
            image_grid_thw=torch.tensor([list(GRID)]),
            max_new_tokens=8,
            do_sample=False,
        )[0, len(expanded):].tolist()
        ref_txt = hf.generate(
            input_ids=torch.tensor(text_prompt)[None],
            max_new_tokens=8,
            do_sample=False,
        )[0, len(text_prompt):].tolist()

    llm = LLM(
        model=path,
        dtype="float32",
        num_kv_blocks=64,
        max_num_seqs=8,
        max_num_batched_tokens=64,
    )
    sp = SamplingParams(max_tokens=8, temperature=0.0)
    outs = llm.generate(
        [
            {
                "prompt_token_ids": raw.tolist(),
                "multi_modal_data": {
                    "image": {
                        "pixel_values": px,
                        "image_grid_thw": [list(GRID)],
                    }
                },
            },
            {"prompt_token_ids": text_prompt},
        ],
        sp,
    )
    assert outs[0].outputs[0].token_ids == ref_img
    assert outs[1].outputs[0].token_ids == ref_txt


def test_llm_generate_multimodal_multi_step(setup):
    """mrope deltas must ride the on-device multi-step decode window."""
    import torch

    from vllm_metax_tpu import LLM, SamplingParams

    hf, path, cfg, model, params = setup
    rng = np.random.default_rng(6)
    px = _pixels(rng, GRID)
    ids = _prompt_ids(rng, 512, 4)
    with torch.no_grad():
        ref = hf.generate(
            input_ids=torch.tensor(ids)[None],
            pixel_values=torch.tensor(px),
            image_grid_thw=torch.tensor([list(GRID)]),
            max_new_tokens=16,
            do_sample=False,
        )[0, len(ids):].tolist()
    llm = LLM(
        model=path,
        dtype="float32",
        num_kv_blocks=64,
        max_num_seqs=8,
        max_num_batched_tokens=64,
        num_decode_steps=4,
    )
    sp = SamplingParams(max_tokens=16, temperature=0.0)
    outs = llm.generate(
        [
            {
                "prompt_token_ids": ids.tolist(),
                "multi_modal_data": {
                    "image": {
                        "pixel_values": px,
                        "image_grid_thw": [list(GRID)],
                    }
                },
            }
        ],
        sp,
    )
    assert outs[0].outputs[0].token_ids == ref


# ---------------------------------------------------------------------------
# Qwen2.5-VL (RMSNorm + SwiGLU vision blocks, window attention)


GRID25 = (1, 8, 8)  # 64 patches → 4 windows of 2×2 merge units (ws=16)


@pytest.fixture(scope="module")
def setup25(tmp_path_factory):
    import torch
    from transformers import (
        Qwen2_5_VLConfig,
        Qwen2_5_VLForConditionalGeneration,
    )

    cfg = Qwen2_5_VLConfig(
        text_config=dict(
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            vocab_size=512,
            max_position_embeddings=256,
            rope_theta=10000.0,
            rope_scaling=dict(type="mrope", mrope_section=[2, 3, 3]),
            tie_word_embeddings=False,
        ),
        vision_config=dict(
            depth=2,
            hidden_size=32,
            num_heads=2,
            out_hidden_size=64,
            intermediate_size=48,
            in_channels=3,
            patch_size=4,
            temporal_patch_size=2,
            spatial_merge_size=2,
            window_size=16,
            fullatt_block_indexes=[1],
            hidden_act="silu",
        ),
        image_token_id=IMG_TOK,
        video_token_id=VID_TOK,
        vision_start_token_id=VSTART,
    )
    torch.manual_seed(1)
    hf = Qwen2_5_VLForConditionalGeneration(cfg).eval()
    path = str(tmp_path_factory.mktemp("q25vl") / "tiny")
    hf.save_pretrained(path, safe_serialization=True)
    mcfg = ModelConfig.from_pretrained(path, dtype="float32")
    model = get_model(mcfg.architecture)
    params = model.load_weights(mcfg, None, path)
    return hf, path, mcfg, model, params


def test_v25_vision_tower_parity(setup25):
    """Window attention (layer 0 windowed, layer 1 full) + RMSNorm +
    SwiGLU vision blocks vs HF."""
    import torch

    hf, _, cfg, model, params = setup25
    rng = np.random.default_rng(7)
    px = _pixels(rng, GRID25)
    with torch.no_grad():
        ref = hf.model.visual(
            torch.tensor(px), grid_thw=torch.tensor([list(GRID25)])
        ).numpy()
    ours = np.asarray(model.encode_images(params, px, [GRID25], cfg))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=3e-4, atol=3e-4)


def test_v25_e2e_generate(setup25):
    import torch

    from vllm_metax_tpu import LLM, SamplingParams

    hf, path, cfg, model, params = setup25
    rng = np.random.default_rng(8)
    px = _pixels(rng, GRID25)
    n_img = 16  # 64 patches / merge²
    ids = np.concatenate(
        [rng.integers(10, 512, 4), [VSTART], [IMG_TOK] * n_img,
         rng.integers(10, 512, 5)]
    ).astype(np.int64)
    with torch.no_grad():
        ref = hf.generate(
            input_ids=torch.tensor(ids)[None],
            pixel_values=torch.tensor(px),
            image_grid_thw=torch.tensor([list(GRID25)]),
            max_new_tokens=8,
            do_sample=False,
        )[0, len(ids):].tolist()
    llm = LLM(
        model=path,
        dtype="float32",
        num_kv_blocks=64,
        max_num_seqs=8,
        max_num_batched_tokens=64,
        num_decode_steps=4,
    )
    outs = llm.generate(
        [
            {
                "prompt_token_ids": ids.tolist(),
                "multi_modal_data": {
                    "image": {
                        "pixel_values": px,
                        "image_grid_thw": [list(GRID25)],
                    }
                },
            }
        ],
        SamplingParams(max_tokens=8, temperature=0.0),
    )
    assert outs[0].outputs[0].token_ids == ref


# ---------------------------------------------------------------------------
# Qwen3-VL (learned pos embed, deepstack, interleaved mrope, Qwen3 text)


GRID3 = (1, 8, 4)  # 32 patches → 8 merged tokens


@pytest.fixture(scope="module")
def setup3(tmp_path_factory):
    import torch
    from transformers import Qwen3VLConfig, Qwen3VLForConditionalGeneration

    cfg = Qwen3VLConfig(
        text_config=dict(
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=3,
            num_attention_heads=4,
            num_key_value_heads=2,
            head_dim=16,
            vocab_size=512,
            max_position_embeddings=256,
            rope_theta=10000.0,
            rope_scaling=dict(
                rope_type="default",
                mrope_section=[2, 3, 3],
                mrope_interleaved=True,
            ),
            tie_word_embeddings=False,
        ),
        vision_config=dict(
            depth=3,
            hidden_size=32,
            num_heads=2,
            out_hidden_size=64,
            intermediate_size=48,
            in_channels=3,
            patch_size=4,
            temporal_patch_size=2,
            spatial_merge_size=2,
            num_position_embeddings=16,
            deepstack_visual_indexes=[0, 1],
            hidden_act="gelu_pytorch_tanh",
        ),
        image_token_id=IMG_TOK,
        video_token_id=VID_TOK,
        vision_start_token_id=VSTART,
    )
    torch.manual_seed(2)
    hf = Qwen3VLForConditionalGeneration(cfg).eval()
    path = str(tmp_path_factory.mktemp("q3vl") / "tiny")
    hf.save_pretrained(path, safe_serialization=True)
    mcfg = ModelConfig.from_pretrained(path, dtype="float32")
    model = get_model(mcfg.architecture)
    params = model.load_weights(mcfg, None, path)
    return hf, path, mcfg, model, params


def test_v3_vision_tower_parity(setup3):
    """Interpolated learned pos embed + deepstack mergers vs HF."""
    import torch

    hf, _, cfg, model, params = setup3
    rng = np.random.default_rng(9)
    px = _pixels(rng, GRID3)
    with torch.no_grad():
        ref, ref_ds = hf.model.visual(
            torch.tensor(px), grid_thw=torch.tensor([list(GRID3)])
        )
    ours, ds = model.encode_images(
        params, px, [GRID3], cfg, want_deepstack=True
    )
    np.testing.assert_allclose(
        np.asarray(ours), ref.numpy(), rtol=3e-4, atol=3e-4
    )
    assert ds.shape[0] == len(ref_ds)
    for i, r in enumerate(ref_ds):
        np.testing.assert_allclose(
            np.asarray(ds[i]), r.numpy(), rtol=3e-4, atol=3e-4
        )


def test_v3_e2e_generate(setup3):
    """Deepstack injection + interleaved mrope through the engine, incl.
    multi-step decode; qk_norm Qwen3 text stack."""
    import torch

    from vllm_metax_tpu import LLM, SamplingParams

    hf, path, cfg, model, params = setup3
    rng = np.random.default_rng(10)
    px = _pixels(rng, GRID3)
    ids = np.concatenate(
        [rng.integers(10, 512, 4), [VSTART], [IMG_TOK] * 8,
         rng.integers(10, 512, 5)]
    ).astype(np.int64)
    with torch.no_grad():
        ref = hf.generate(
            input_ids=torch.tensor(ids)[None],
            pixel_values=torch.tensor(px),
            image_grid_thw=torch.tensor([list(GRID3)]),
            max_new_tokens=12,
            do_sample=False,
        )[0, len(ids):].tolist()
    llm = LLM(
        model=path,
        dtype="float32",
        num_kv_blocks=64,
        max_num_seqs=8,
        max_num_batched_tokens=32,  # forces chunked prefill mid-image
        num_decode_steps=4,
    )
    outs = llm.generate(
        [
            {
                "prompt_token_ids": ids.tolist(),
                "multi_modal_data": {
                    "image": {
                        "pixel_values": px,
                        "image_grid_thw": [list(GRID3)],
                    }
                },
            }
        ],
        SamplingParams(max_tokens=12, temperature=0.0),
    )
    assert outs[0].outputs[0].token_ids == ref


# ---------------------------------------------------------------------------
# raw-image inputs (HF image-processor path) + OpenAI server image parts


def _tiny_vl_tokenizer(path):
    """Byte-level BPE tokenizer with vision special tokens; returns their
    ids for wiring into the model config."""
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers
    from transformers import PreTrainedTokenizerFast

    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=320,
        special_tokens=[
            "<s>", "</s>", "<|vision_start|>", "<|image_pad|>",
            "<|vision_end|>",
        ],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
    )
    tok.train_from_iterator(
        ["describe the image please " * 8, "hello world test " * 8], trainer
    )
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, bos_token="<s>", eos_token="</s>",
        additional_special_tokens=[
            "<|vision_start|>", "<|image_pad|>", "<|vision_end|>",
        ],
    )
    fast.chat_template = (
        "{% for m in messages %}{{ m['role'] }}: {{ m['content'] }}\n"
        "{% endfor %}assistant:"
    )
    fast.save_pretrained(path)
    ids = fast.convert_tokens_to_ids(
        ["<|vision_start|>", "<|image_pad|>", "<|vision_end|>"]
    )
    return fast, ids


@pytest.fixture(scope="module")
def vl_server(tmp_path_factory):
    import threading

    import torch
    from transformers import Qwen2VLConfig, Qwen2VLForConditionalGeneration

    tmp = tmp_path_factory.mktemp("vlsrv")
    path = str(tmp / "tiny")
    import os

    os.makedirs(path, exist_ok=True)
    tokenizer, (vs, img, ve) = _tiny_vl_tokenizer(path)
    vocab = max(tokenizer.get_vocab().values()) + 1
    cfg = Qwen2VLConfig(
        text_config=dict(
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            vocab_size=vocab,
            max_position_embeddings=1024,
            rope_theta=10000.0,
            rope_scaling=dict(type="mrope", mrope_section=[2, 3, 3]),
            tie_word_embeddings=False,
        ),
        vision_config=dict(
            depth=2,
            embed_dim=32,
            num_heads=2,
            hidden_size=64,
            in_channels=3,
            patch_size=4,
            temporal_patch_size=2,
            spatial_merge_size=2,
            mlp_ratio=2,
            hidden_act="quick_gelu",
        ),
        image_token_id=img,
        video_token_id=1,  # distinct unused id (eos; never follows vs here)
        vision_start_token_id=vs,
        vision_end_token_id=ve,
    )
    torch.manual_seed(3)
    hf = Qwen2VLForConditionalGeneration(cfg).eval()
    hf.save_pretrained(path, safe_serialization=True)

    from vllm_metax_tpu.entrypoints.api_server import build_server

    srv = build_server(
        "127.0.0.1", 0, path, dtype="float32", max_model_len=1024,
        max_num_seqs=4,
    )
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    yield url, hf, tokenizer, path
    srv.shutdown()
    srv.state.engine.shutdown()


def _proc_for(cfg_path):
    from transformers import Qwen2VLImageProcessor

    return Qwen2VLImageProcessor(
        patch_size=4, merge_size=2, temporal_patch_size=2
    )


def test_llm_generate_raw_image(setup):
    """Raw numpy HWC image through the HF image-processor fallback."""
    import torch

    from vllm_metax_tpu import LLM, SamplingParams

    hf, path, cfg, model, params = setup
    rng = np.random.default_rng(11)
    image = (rng.random((24, 32, 3)) * 255).astype(np.uint8)
    proc = _proc_for(path)
    enc = proc(images=[image], return_tensors="np")
    grid = [int(x) for x in enc["image_grid_thw"][0]]
    merge2 = 4
    n_img = int(np.prod(grid)) // merge2
    ids = np.concatenate(
        [np.arange(20, 26), [VSTART], [IMG_TOK] * n_img, np.arange(30, 34)]
    ).astype(np.int64)
    with torch.no_grad():
        ref = hf.generate(
            input_ids=torch.tensor(ids)[None],
            pixel_values=torch.tensor(enc["pixel_values"], dtype=torch.float32),
            image_grid_thw=torch.tensor([grid]),
            max_new_tokens=6,
            do_sample=False,
        )[0, len(ids):].tolist()
    llm = LLM(
        model=path, dtype="float32", num_kv_blocks=64, max_num_seqs=4,
        max_num_batched_tokens=128,
    )
    raw_ids = np.concatenate(
        [np.arange(20, 26), [VSTART], [IMG_TOK], np.arange(30, 34)]
    ).tolist()
    out = llm.generate(
        [{"prompt_token_ids": raw_ids,
          "multi_modal_data": {"image": image}}],
        SamplingParams(max_tokens=6, temperature=0.0),
    )
    assert out[0].outputs[0].token_ids == ref


def test_server_chat_image(vl_server):
    """OpenAI chat with a base64 image content part."""
    import base64
    import io
    import json
    import urllib.request

    import torch
    from PIL import Image

    url, hf, tokenizer, path = vl_server
    rng = np.random.default_rng(12)
    arr = (rng.random((24, 32, 3)) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()

    messages = [
        {
            "role": "user",
            "content": [
                {"type": "text", "text": "describe "},
                {
                    "type": "image_url",
                    "image_url": {"url": f"data:image/png;base64,{b64}"},
                },
                {"type": "text", "text": " please"},
            ],
        }
    ]
    body = {"messages": messages, "max_tokens": 6, "temperature": 0.0}
    req = urllib.request.Request(
        url + "/v1/chat/completions",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=300) as r:
        out = json.loads(r.read())
    got_text = out["choices"][0]["message"]["content"]

    # reference: same pipeline by hand
    hf_cfg = hf.config
    ph = tokenizer.decode([
        hf_cfg.vision_start_token_id, hf_cfg.image_token_id,
        hf_cfg.vision_end_token_id,
    ])
    flat = [{"role": "user", "content": f"describe {ph} please"}]
    ids = tokenizer.apply_chat_template(flat, add_generation_prompt=True)
    proc = _proc_for(path)
    img = Image.open(io.BytesIO(buf.getvalue())).convert("RGB")
    enc = proc(images=[img], return_tensors="np")
    grid = [int(x) for x in enc["image_grid_thw"][0]]
    n_img = int(np.prod(grid)) // 4
    pos = ids.index(hf_cfg.image_token_id)
    ids = ids[:pos] + [hf_cfg.image_token_id] * n_img + ids[pos + 1:]
    with torch.no_grad():
        ref = hf.generate(
            input_ids=torch.tensor(ids)[None],
            pixel_values=torch.tensor(enc["pixel_values"], dtype=torch.float32),
            image_grid_thw=torch.tensor([grid]),
            max_new_tokens=6,
            do_sample=False,
        )[0, len(ids):].tolist()
    assert got_text == tokenizer.decode(ref, skip_special_tokens=True)


# ---------------------------------------------------------------------------
# video inputs


def test_video_e2e_qwen2vl(setup):
    """Video (t=2) + image in ONE prompt: per-frame vision segments,
    interleaved grid queues, mrope over frame indices."""
    import torch

    from vllm_metax_tpu import LLM, SamplingParams

    hf, path, cfg, model, params = setup
    rng = np.random.default_rng(20)
    vgrid = (2, 4, 4)  # 32 patches → 8 merged tokens
    igrid = GRID  # 16 patches → 4 merged tokens
    vpx = _pixels(rng, vgrid)
    ipx = _pixels(rng, igrid)
    ids = np.concatenate(
        [rng.integers(10, 512, 3), [VSTART], [VID_TOK] * 8,
         rng.integers(10, 512, 2), [VSTART], [IMG_TOK] * 4,
         rng.integers(10, 512, 3)]
    ).astype(np.int64)
    with torch.no_grad():
        ref = hf.generate(
            input_ids=torch.tensor(ids)[None],
            pixel_values=torch.tensor(ipx),
            image_grid_thw=torch.tensor([list(igrid)]),
            pixel_values_videos=torch.tensor(vpx),
            video_grid_thw=torch.tensor([list(vgrid)]),
            max_new_tokens=6,
            do_sample=False,
        )[0, len(ids):].tolist()
    llm = LLM(
        model=path, dtype="float32", num_kv_blocks=64, max_num_seqs=4,
        max_num_batched_tokens=64, num_decode_steps=4,
    )
    outs = llm.generate(
        [{
            "prompt_token_ids": ids.tolist(),
            "multi_modal_data": {
                "image": {"pixel_values": ipx,
                          "image_grid_thw": [igrid]},
                "video": {"pixel_values_videos": vpx,
                          "video_grid_thw": [vgrid]},
            },
        }],
        SamplingParams(max_tokens=6, temperature=0.0),
    )
    assert outs[0].outputs[0].token_ids == ref


def test_video_e2e_qwen25vl_time_scaling(setup25):
    """Qwen2.5-VL temporal index scaling (second_per_grid_ts ×
    tokens_per_second)."""
    import torch

    from vllm_metax_tpu import LLM, SamplingParams

    hf, path, cfg, model, params = setup25
    rng = np.random.default_rng(21)
    vgrid = (2, 4, 4)
    vpx = _pixels(rng, vgrid)
    spg = 2.5
    n_vid = 8
    ids = np.concatenate(
        [rng.integers(10, 512, 4), [VSTART], [VID_TOK] * n_vid,
         rng.integers(10, 512, 4)]
    ).astype(np.int64)
    with torch.no_grad():
        ref = hf.generate(
            input_ids=torch.tensor(ids)[None],
            pixel_values_videos=torch.tensor(vpx),
            video_grid_thw=torch.tensor([list(vgrid)]),
            second_per_grid_ts=torch.tensor([spg]),
            max_new_tokens=6,
            do_sample=False,
        )[0, len(ids):].tolist()
    llm = LLM(
        model=path, dtype="float32", num_kv_blocks=64, max_num_seqs=4,
        max_num_batched_tokens=64, num_decode_steps=4,
    )
    outs = llm.generate(
        [{
            "prompt_token_ids": ids.tolist(),
            "multi_modal_data": {
                "video": {"pixel_values_videos": vpx,
                          "video_grid_thw": [vgrid],
                          "second_per_grid_ts": [spg]},
            },
        }],
        SamplingParams(max_tokens=6, temperature=0.0),
    )
    assert outs[0].outputs[0].token_ids == ref


def test_video_e2e_qwen3vl_frame_split(setup3):
    """Qwen3-VL: per-frame rope grid splitting for videos. The prompt uses
    the timestamped per-frame format the HF processor emits (each frame's
    tokens preceded by their own vision_start)."""
    import torch

    from vllm_metax_tpu import LLM, SamplingParams

    hf, path, cfg, model, params = setup3
    rng = np.random.default_rng(22)
    vgrid = (2, 4, 4)
    vpx = _pixels(rng, vgrid)
    ids = np.concatenate(
        [rng.integers(10, 512, 4),
         [VSTART], [VID_TOK] * 4,  # frame 1
         rng.integers(10, 512, 1),  # "timestamp" text between frames
         [VSTART], [VID_TOK] * 4,  # frame 2
         rng.integers(10, 512, 4)]
    ).astype(np.int64)
    with torch.no_grad():
        ref = hf.generate(
            input_ids=torch.tensor(ids)[None],
            pixel_values_videos=torch.tensor(vpx),
            video_grid_thw=torch.tensor([list(vgrid)]),
            max_new_tokens=6,
            do_sample=False,
        )[0, len(ids):].tolist()
    llm = LLM(
        model=path, dtype="float32", num_kv_blocks=64, max_num_seqs=4,
        max_num_batched_tokens=64, num_decode_steps=4,
    )
    outs = llm.generate(
        [{
            "prompt_token_ids": ids.tolist(),
            "multi_modal_data": {
                "video": {"pixel_values_videos": vpx,
                          "video_grid_thw": [vgrid]},
            },
        }],
        SamplingParams(max_tokens=6, temperature=0.0),
    )
    assert outs[0].outputs[0].token_ids == ref


def test_mm_prefix_caching(setup):
    """Identical image+prompt shares prefix blocks; a different image with
    the SAME placeholder tokens must not alias (mm-seeded hash chains)."""
    import torch

    from vllm_metax_tpu import LLM, SamplingParams

    hf, path, cfg, model, params = setup
    rng = np.random.default_rng(30)
    # long text prefix so full blocks precede the image
    ids = np.concatenate(
        [rng.integers(10, 512, 40), [VSTART], [IMG_TOK] * 4,
         rng.integers(10, 512, 6)]
    ).astype(np.int64)
    px_a = _pixels(rng, GRID)
    px_b = _pixels(rng, GRID)

    def ref(px):
        with torch.no_grad():
            return hf.generate(
                input_ids=torch.tensor(ids)[None],
                pixel_values=torch.tensor(px),
                image_grid_thw=torch.tensor([list(GRID)]),
                max_new_tokens=6,
                do_sample=False,
            )[0, len(ids):].tolist()

    llm = LLM(
        model=path, dtype="float32", num_kv_blocks=64, max_num_seqs=4,
        max_num_batched_tokens=64,
    )
    sp = SamplingParams(max_tokens=6, temperature=0.0)

    def run(px):
        return llm.generate(
            [{
                "prompt_token_ids": ids.tolist(),
                "multi_modal_data": {
                    "image": {"pixel_values": px,
                              "image_grid_thw": [GRID]},
                },
            }],
            sp,
        )[0].outputs[0].token_ids

    assert run(px_a) == ref(px_a)
    cached_before = llm.engine.scheduler.num_prefix_cached_tokens
    # same image + prompt again → prefix-cache hit, same output
    assert run(px_a) == ref(px_a)
    assert llm.engine.scheduler.num_prefix_cached_tokens > cached_before
    # DIFFERENT image, identical token ids → must not alias cached KV
    assert run(px_b) == ref(px_b)


def test_vl_tp2_matches_single_device(setup):
    """TP=2 over the CPU mesh: text stack sharded, vision tower replicated,
    mrope metadata replicated — outputs must match single-device exactly."""
    from vllm_metax_tpu.config import (
        CacheConfig,
        EngineConfig,
        LoadConfig,
        ModelConfig,
        ParallelConfig,
        QuantizationConfig,
        SchedulerConfig,
    )
    from vllm_metax_tpu.core.engine import EngineCore
    from vllm_metax_tpu.parallel.mesh import make_tp_mesh
    from vllm_metax_tpu.sample.params import SamplingParams

    _, path, _, _, _ = setup
    rng = np.random.default_rng(40)
    px = _pixels(rng, GRID)
    ids = _prompt_ids(rng, 512, 4).tolist()
    mmd = {"pixel_values": px, "image_grid_thw": [GRID]}

    def run(tp, mesh=None):
        cfg = EngineConfig(
            model_config=ModelConfig.from_pretrained(path, dtype="float32"),
            cache_config=CacheConfig(block_size=16, num_blocks=64),
            scheduler_config=SchedulerConfig(
                max_num_seqs=4, max_num_batched_tokens=64
            ),
            parallel_config=ParallelConfig(tensor_parallel_size=tp),
            load_config=LoadConfig(load_format="dummy", seed=0),
            quant_config=QuantizationConfig(),
        )
        eng = EngineCore(cfg, mesh=mesh)
        eng.add_request(
            "r0", ids, SamplingParams(max_tokens=8, temperature=0.0),
            multi_modal_data=mmd,
        )
        acc = []
        while eng.has_unfinished_requests():
            for out in eng.step():
                acc.extend(out.new_token_ids)
        return acc

    ref = run(1)
    out = run(2, make_tp_mesh(2))
    assert out == ref and len(ref) == 8


def test_qwen3_vl_moe_e2e(tmp_path_factory):
    """Qwen3-VL-MoE: MoE text stack (packed expert tensors, softmax-topk
    renorm) + deepstack vision, e2e greedy vs HF."""
    import torch
    from transformers import (
        Qwen3VLMoeConfig,
        Qwen3VLMoeForConditionalGeneration,
    )

    from vllm_metax_tpu import LLM, SamplingParams

    cfg = Qwen3VLMoeConfig(
        text_config=dict(
            hidden_size=64,
            intermediate_size=128,
            moe_intermediate_size=32,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            head_dim=16,
            vocab_size=512,
            max_position_embeddings=256,
            rope_theta=10000.0,
            num_experts=4,
            num_experts_per_tok=2,
            norm_topk_prob=True,
            rope_scaling=dict(
                rope_type="default",
                mrope_section=[2, 3, 3],
                mrope_interleaved=True,
            ),
            tie_word_embeddings=False,
        ),
        vision_config=dict(
            depth=2,
            hidden_size=32,
            num_heads=2,
            out_hidden_size=64,
            intermediate_size=48,
            in_channels=3,
            patch_size=4,
            temporal_patch_size=2,
            spatial_merge_size=2,
            num_position_embeddings=16,
            deepstack_visual_indexes=[0, 1],
            hidden_act="gelu_pytorch_tanh",
        ),
        image_token_id=IMG_TOK,
        video_token_id=VID_TOK,
        vision_start_token_id=VSTART,
    )
    torch.manual_seed(6)
    hf = Qwen3VLMoeForConditionalGeneration(cfg).eval()
    path = str(tmp_path_factory.mktemp("q3vlmoe") / "tiny")
    hf.save_pretrained(path, safe_serialization=True)

    rng = np.random.default_rng(50)
    px = _pixels(rng, GRID3)
    ids = np.concatenate(
        [rng.integers(10, 512, 4), [VSTART], [IMG_TOK] * 8,
         rng.integers(10, 512, 5)]
    ).astype(np.int64)
    txt = rng.integers(10, 512, size=9).tolist()
    with torch.no_grad():
        ref = hf.generate(
            input_ids=torch.tensor(ids)[None],
            pixel_values=torch.tensor(px),
            image_grid_thw=torch.tensor([list(GRID3)]),
            max_new_tokens=8,
            do_sample=False,
        )[0, len(ids):].tolist()
        ref_t = hf.generate(
            torch.tensor(txt)[None], max_new_tokens=8, do_sample=False
        )[0, len(txt):].tolist()
    llm = LLM(
        model=path, dtype="float32", num_kv_blocks=64, max_num_seqs=4,
        max_num_batched_tokens=64, num_decode_steps=4,
    )
    sp = SamplingParams(max_tokens=8, temperature=0.0)
    outs = llm.generate(
        [
            {
                "prompt_token_ids": ids.tolist(),
                "multi_modal_data": {
                    "image": {"pixel_values": px,
                              "image_grid_thw": [GRID3]},
                },
            },
            {"prompt_token_ids": txt},
        ],
        sp,
    )
    assert outs[0].outputs[0].token_ids == ref
    assert outs[1].outputs[0].token_ids == ref_t


def test_mm_preemption_recompute(setup):
    """A tiny KV pool forces preemption-by-recompute mid-decode; preempted
    multimodal requests must resume token-exact (vision embeds + mrope
    tables are admission-cached and survive the recompute)."""
    from vllm_metax_tpu import LLM, SamplingParams

    _, path, cfg, model, params = setup
    rng = np.random.default_rng(60)
    reqs = []
    for i in range(3):
        px = _pixels(rng, GRID)
        ids = np.concatenate(
            [rng.integers(10, 512, 8 + 4 * i), [VSTART], [IMG_TOK] * 4,
             rng.integers(10, 512, 6)]
        ).tolist()
        reqs.append({
            "prompt_token_ids": ids,
            "multi_modal_data": {
                "image": {"pixel_values": px, "image_grid_thw": [GRID]},
            },
        })
    sp = SamplingParams(max_tokens=24, temperature=0.0, ignore_eos=True)

    def run(num_blocks):
        llm = LLM(
            model=path, dtype="float32", num_kv_blocks=num_blocks,
            max_num_seqs=4, max_num_batched_tokens=64,
        )
        outs = llm.generate(list(reqs), sp)
        n_preempt = llm.engine.scheduler.num_preemptions
        return [o.outputs[0].token_ids for o in outs], n_preempt

    roomy, _ = run(64)
    tight, n_preempt = run(8)  # 8 blocks × 16 slots can't hold 3 requests
    assert n_preempt > 0, "pool was large enough to avoid preempt"
    assert tight == roomy
