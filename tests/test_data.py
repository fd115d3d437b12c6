"""Data-layer tests with synthetic tar/parquet/json fixtures."""
import io
import json
import os
import tarfile

import numpy as np
import pytest

from unigen_tpu.data.combined import combined_loader
from unigen_tpu.data.imagenet import ImageNetDataset, load_synset_mapping
from unigen_tpu.data.lm_data import ParquetTextDataset
from unigen_tpu.data.llava import (IGNORE_INDEX, LlavaDataset, collate_batch,
                                   preprocess_qwen)
from unigen_tpu.data.text2image import (Text2ImageDataset, brace_expand,
                                        iterate_tar_samples)
from unigen_tpu.data.transform import image_transform, pad_image, siglip_preprocess

from test_prompting import MockTokenizer


def _png_bytes(size=32, color=(255, 0, 0)):
    from PIL import Image
    buf = io.BytesIO()
    Image.new("RGB", (size, size), color).save(buf, format="PNG")
    return buf.getvalue()


def _make_tar(path, n=6, with_bad=True):
    with tarfile.open(path, "w") as tf:
        for i in range(n):
            key = f"{i:05d}"
            img = _png_bytes(color=(i * 20 % 255, 10, 10))
            info = tarfile.TarInfo(f"{key}.png")
            info.size = len(img)
            tf.addfile(info, io.BytesIO(img))
            meta = json.dumps({"prompt": f"The image shows a cat number {i}",
                               "short_caption": f"cat {i}"}).encode()
            info = tarfile.TarInfo(f"{key}.json")
            info.size = len(meta)
            tf.addfile(info, io.BytesIO(meta))
        if with_bad:
            bad = b"not an image"
            info = tarfile.TarInfo("zzbad.png")
            info.size = len(bad)
            tf.addfile(info, io.BytesIO(bad))
            cap = b"caption for bad"
            info = tarfile.TarInfo("zzbad.txt")
            info.size = len(cap)
            tf.addfile(info, io.BytesIO(cap))


def test_brace_expand():
    assert brace_expand("s-{000..002}.tar") == ["s-000.tar", "s-001.tar", "s-002.tar"]
    assert brace_expand("plain.tar") == ["plain.tar"]


def test_pipe_url_streams_tar(tmp_path):
    """webdataset 'pipe:' URLs stream a subprocess's stdout (the reference's
    s3 `pipe:aws s3 cp ... -` pattern, data_loader.py:65-94); sample grouping
    must match the local-path reader."""
    shard = str(tmp_path / "train-000.tar")
    _make_tar(shard)
    local = list(iterate_tar_samples(shard))
    piped = list(iterate_tar_samples(f"pipe:cat {shard}"))
    assert [s["__key__"] for s in piped] == [s["__key__"] for s in local]
    assert piped[0].keys() == local[0].keys()
    # failing command behaves like an unreadable tar: yields nothing
    assert list(iterate_tar_samples("pipe:false")) == []
    # dataset-level: pipe shards force the python reader (the C++ core reads
    # local files only) and batch identically to the local path
    ds = Text2ImageDataset([f"pipe:cat {shard}"], per_device_batch_size=3,
                           resolution=16, num_batches=2, short_caption_ratio=0.0)
    batches = list(ds)
    assert len(batches) == 2 and batches[0]["images"].shape == (3, 16, 16, 3)


def test_tar_iteration_and_batching(tmp_path):
    shard = str(tmp_path / "train-000.tar")
    _make_tar(shard)
    samples = list(iterate_tar_samples(shard))
    assert len(samples) == 7  # 6 good + 1 bad grouped
    ds = Text2ImageDataset([str(tmp_path / "train-{000..000}.tar")],
                           per_device_batch_size=4, resolution=16, num_batches=3,
                           short_caption_ratio=0.0)
    batches = list(ds)
    assert len(batches) == 3
    assert batches[0]["images"].shape == (4, 16, 16, 3)
    assert all(isinstance(t, str) for t in batches[0]["input_ids"])
    # prefix "The image shows " stripped, first letter uppercased
    assert any(t.startswith("A cat number") for t in batches[0]["input_ids"])


def test_caption_prompt_and_person(tmp_path):
    shard = str(tmp_path / "t.tar")
    with tarfile.open(shard, "w") as tf:
        img = _png_bytes()
        info = tarfile.TarInfo("x.png")
        info.size = len(img)
        tf.addfile(info, io.BytesIO(img))
        cap = b"<person> riding a bike"
        info = tarfile.TarInfo("x.txt")
        info.size = len(cap)
        tf.addfile(info, io.BytesIO(cap))
    ds = Text2ImageDataset([shard], per_device_batch_size=1, resolution=16,
                           num_batches=1, add_caption_prompt=True)
    batch = next(iter(ds))
    text = batch["input_ids"][0]
    assert "<person>" not in text and "person riding a bike" in text
    assert "\n" in text  # caption prompt prepended


def test_parquet_lm_stream(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    table = pa.table({"content": [f"document {i} " + "x" * 50 for i in range(10)]})
    path = str(tmp_path / "data.parquet")
    pq.write_table(table, path)
    ds = ParquetTextDataset([path], per_device_batch_size=4, max_length_chars=20)
    batch = next(iter(ds))
    assert len(batch["input_ids"]) == 4
    assert all(len(t) <= 20 for t in batch["input_ids"])
    # distributed sharding: two processes see disjoint rows
    d0 = ParquetTextDataset([path], 4, process_index=0, process_count=2)
    d1 = ParquetTextDataset([path], 4, process_index=1, process_count=2)
    r0 = next(iter(d0))["input_ids"]
    r1 = next(iter(d1))["input_ids"]
    assert set(t[:10] for t in r0).isdisjoint(set(t[:10] for t in r1))


def test_preprocess_qwen_label_masking():
    tok = MockTokenizer()
    convs = [[{"from": "human", "value": "what is this? <image>"},
              {"from": "gpt", "value": "a cat"}]]
    out = preprocess_qwen(convs, tok)
    ids, labs = out["input_ids"][0], out["labels"][0]
    assert len(ids) == len(labs)
    # user turn fully masked, assistant turn fully labeled
    n_user = len(tok("<|im_start|>user\nwhat is this?<|im_end|>\n")["input_ids"])
    assert all(l == IGNORE_INDEX for l in labs[:n_user])
    assert all(l != IGNORE_INDEX for l in labs[n_user:])
    assert labs[n_user:] == ids[n_user:]
    # skips a leading assistant turn
    convs2 = [[{"from": "gpt", "value": "hi"},
               {"from": "human", "value": "q"}, {"from": "gpt", "value": "a"}]]
    out2 = preprocess_qwen(convs2, tok)
    assert len(out2["input_ids"][0]) < len(
        preprocess_qwen([convs2[0]], tok)["input_ids"][0]) + 100


def test_llava_dataset_end_to_end(tmp_path):
    from PIL import Image
    os.makedirs(tmp_path / "imgs", exist_ok=True)
    Image.new("RGB", (40, 40), (0, 200, 0)).save(tmp_path / "imgs" / "a.png")
    data = [{"image": "a.png",
             "conversations": [{"from": "human", "value": "<image>\nwhat?"},
                               {"from": "gpt", "value": "green"}]},
            {"image": "missing.png",
             "conversations": [{"from": "human", "value": "q"},
                               {"from": "gpt", "value": "a"}]}]
    jpath = str(tmp_path / "d.json")
    with open(jpath, "w") as f:
        json.dump(data, f)
    ds = LlavaDataset([jpath], str(tmp_path / "imgs"), MockTokenizer(),
                      per_device_batch_size=2, max_length=64, resolution=16,
                      with_system=True)
    batch = next(iter(ds))
    assert batch["input_ids"].shape == (2, 64)
    assert batch["labels"].shape == (2, 64)
    assert batch["images"].shape == (2, 16, 16, 3)
    assert batch["input_ids_system"].shape[0] == 2


def test_imagenet_dataset(tmp_path):
    from PIL import Image
    for wnid, color in [("n01", (255, 0, 0)), ("n02", (0, 255, 0))]:
        os.makedirs(tmp_path / "train" / wnid, exist_ok=True)
        for i in range(2):
            Image.new("RGB", (20, 20), color).save(tmp_path / "train" / wnid / f"{wnid}_{i}.jpg")
    mpath = str(tmp_path / "mapping.txt")
    with open(mpath, "w") as f:
        f.write("n01: tench, fish\nn02: goldfish\n")
    ds = ImageNetDataset(str(tmp_path / "train"),
                         synset_mapping=load_synset_mapping(mpath),
                         per_device_batch_size=2, image_size=16,
                         prefix_prompt="a photo of ")
    batch = next(iter(ds))
    assert batch["images"].shape == (2, 16, 16, 3)
    assert all(t.startswith("a photo of ") for t in batch["input_ids"])
    assert any(t.split("a photo of ")[1] in ("tench", "fish", "goldfish")
               for t in batch["input_ids"])


def test_imagenet_dataset_vendored_synsets(tmp_path):
    """Out-of-the-box construction from a path alone: the vendored ILSVRC-2012
    table resolves real wnids to captions with no external mapping file
    (VERDICT r2 item 8; reference inlines the same public 1000-class dict,
    imagenet_dataset.py:19-1022)."""
    from PIL import Image
    mapping = load_synset_mapping()
    assert len(mapping) == 1000
    assert mapping["n01440764"].startswith("tench")
    for wnid in ["n01440764", "n01443537"]:
        os.makedirs(tmp_path / "train" / wnid, exist_ok=True)
        Image.new("RGB", (20, 20), (9, 9, 9)).save(
            tmp_path / "train" / wnid / f"{wnid}_0.jpg")
    ds = ImageNetDataset(str(tmp_path / "train"), per_device_batch_size=2,
                         image_size=16)
    batch = next(iter(ds))
    syns = {s.strip() for n in mapping.values() for s in n.split(",")}
    assert all(t in syns for t in batch["input_ids"])


def test_combined_loader():
    a = [{"x": 1}, {"x": 2}]

    def infinite():
        i = 0
        while True:
            yield {"y": i}
            i += 1

    out = list(__import__("itertools").islice(
        combined_loader({"t2i": infinite(), "lm": a}), 5))
    assert len(out) == 5
    assert out[0]["lm"]["x"] == 1 and out[2]["lm"]["x"] == 1  # cycled
    assert out[4]["t2i"]["y"] == 4


def test_transforms():
    from PIL import Image
    img = Image.new("RGB", (100, 60), (128, 128, 128))
    x = image_transform(img, 32)
    assert x.shape == (32, 32, 3)
    assert abs(float(x.mean())) < 0.02  # 128/255 ≈ 0.502 -> ~0 after ±1 norm
    p = pad_image(img, (64, 64))
    assert p.shape == (64, 64, 3)
    assert p[0].sum() == 0  # top padding row
    s = siglip_preprocess(img, 28)
    assert s.shape == (28, 28, 3)


def test_native_tarloader(tmp_path):
    from unigen_tpu.data.native import NativeTarStream, native_available
    if not native_available():
        pytest.skip("libtarloader.so not built")
    shard1 = str(tmp_path / "a.tar")
    shard2 = str(tmp_path / "b.tar")
    _make_tar(shard1, n=3, with_bad=False)
    _make_tar(shard2, n=2, with_bad=False)
    stream = NativeTarStream([shard1, shard2], seed=0, resample=False)
    samples = list(stream)
    assert len(samples) == 5
    keys = {s["__key__"] for s in samples}
    assert len(keys) == 3  # 00000..00002 shared basenames across shards
    s = samples[0]
    assert ".png" in s and ".json" in s
    meta = json.loads(s[".json"])
    assert "prompt" in meta
    # python and native parsers agree sample-for-sample on one shard
    py = list(iterate_tar_samples(shard1))
    nat = list(NativeTarStream([shard1], resample=False))
    assert [p["__key__"] for p in py] == [n["__key__"] for n in nat]
    for p, n in zip(py, nat):
        assert p[".png"] == n[".png"] and p[".json"] == n[".json"]


def test_native_tarloader_resample_is_infinite(tmp_path):
    from unigen_tpu.data.native import NativeTarStream, native_available
    if not native_available():
        pytest.skip("libtarloader.so not built")
    shard = str(tmp_path / "r.tar")
    _make_tar(shard, n=2, with_bad=False)
    stream = NativeTarStream([shard], seed=1, resample=True)
    it = iter(stream)
    got = [next(it)["__key__"] for _ in range(7)]  # > shard size: keeps streaming
    assert len(got) == 7
    stream.close()


def test_preprocess_plain_caption_pretrain():
    """plain prompt type: '<caption><sep>' + eos, user-turn prefix masked
    (reference llava_data_unified.py:207-230)."""
    from unigen_tpu.data.llava import preprocess_plain
    tok = MockTokenizer()
    srcs = [[{"from": "human", "value": "<image>"},
             {"from": "gpt", "value": "a green field"}]]
    out = preprocess_plain(srcs, tok)
    expected = tok("a green field\n")["input_ids"] + [tok.eos_token_id]
    assert out["input_ids"][0] == expected
    # empty user turn -> no masked prefix; labels == ids
    assert out["labels"][0] == expected
    assert out["input_ids_system"][0] == []


def test_naflex_preprocess_shapes():
    from unigen_tpu.data.transform import naflex_preprocess
    from PIL import Image
    img = Image.new("RGB", (100, 60), (10, 20, 30))
    out = naflex_preprocess(img, patch_size=8, max_num_patches=32)
    assert out["pixel_values"].shape == (32, 8 * 8 * 3)
    h, w = out["spatial_shapes"]
    assert h * w <= 32
    assert out["pixel_attention_mask"].sum() == h * w
    # aspect roughly preserved (wide image -> more width patches)
    assert w > h
    # padded slots zero, valid slots normalized to [-1, 1]
    assert np.all(out["pixel_values"][h * w:] == 0)
    assert np.all(np.abs(out["pixel_values"][: h * w]) <= 1.0)


def test_llava_dataset_naflex_mode(tmp_path):
    """NaFlex loader outputs: patchified images + pixel_attention_mask +
    spatial_shapes batched at the loader (reference llava_data_unified.py:
    316-327, collate_fn :415-421)."""
    from PIL import Image
    os.makedirs(tmp_path / "imgs", exist_ok=True)
    Image.new("RGB", (64, 32), (0, 200, 0)).save(tmp_path / "imgs" / "a.png")
    data = [{"image": "a.png",
             "conversations": [{"from": "human", "value": "<image>\nwhat?"},
                               {"from": "gpt", "value": "green"}]}]
    jpath = str(tmp_path / "d.json")
    with open(jpath, "w") as f:
        json.dump(data, f)
    ds = LlavaDataset([jpath], str(tmp_path / "imgs"), MockTokenizer(),
                      per_device_batch_size=2, max_length=48,
                      visual_mode="naflex", naflex_patch_size=8,
                      naflex_max_patches=16, with_system=True)
    batch = next(iter(ds))
    assert batch["images"].shape == (2, 16, 8 * 8 * 3)
    assert batch["pixel_attention_mask"].shape == (2, 16)
    assert batch["spatial_shapes"].shape == (2, 2)
    h, w = batch["spatial_shapes"][0]
    assert batch["pixel_attention_mask"][0].sum() == h * w


def test_sft_step_naflex_from_loader(tmp_path):
    """SFT-with-NaFlex is drivable from data: LlavaDataset('naflex') batch ->
    make_sft_train_step with a Siglip2 tower -> finite losses."""
    import jax
    import jax.numpy as jnp
    from PIL import Image
    from unigen_tpu.models import magvit as MV
    from unigen_tpu.models import siglip2 as SG2
    from unigen_tpu.models import unigen as U
    from unigen_tpu.training import lr_schedules as LRS
    from unigen_tpu.training.optimizer import make_optimizer
    from unigen_tpu.training.sft import SFTStepConfig, make_sft_train_step
    from unigen_tpu.training.train_step import init_train_state

    os.makedirs(tmp_path / "imgs", exist_ok=True)
    Image.new("RGB", (32, 16), (0, 100, 250)).save(tmp_path / "imgs" / "a.png")
    data = [{"image": "a.png",
             "conversations": [{"from": "human", "value": "<image>\nwhat?"},
                               {"from": "gpt", "value": "blue"}]}]
    jpath = str(tmp_path / "d.json")
    with open(jpath, "w") as f:
        json.dump(data, f)

    tok = MockTokenizer()
    max_patches, patch = 16, 4
    ds = LlavaDataset([jpath], str(tmp_path / "imgs"), tok,
                      per_device_batch_size=2, max_length=24,
                      visual_mode="naflex", naflex_patch_size=patch,
                      naflex_max_patches=max_patches)
    batch = next(iter(ds))

    cfg = U.UniGenConfig.tiny(text_vocab_len=len(tok), w_und_encoder=True,
                              mm_input_dim=32)
    vq_cfg = MV.MagvitConfig.tiny(resolution=8, z_channels=5)
    vs_cfg = SG2.Siglip2Config.tiny(hidden_size=32, num_patches=max_patches,
                                    patch_size=patch)
    params = U.init(jax.random.key(0), cfg)
    vs_params = SG2.init(jax.random.key(2), vs_cfg)

    b = 2
    part1 = np.random.default_rng(0).integers(3, 100, size=(b, 3))
    l_conv = batch["input_ids"].shape[1]
    labels = np.concatenate([np.full((b, 3 + max_patches), -100),
                             batch["labels"]], axis=1)
    pos = SG2.resize_positional_embeddings(
        vs_params["pos_embed"]["weight"], batch["spatial_shapes"], max_patches)
    sft_batch = {
        "mmu_part1": jnp.asarray(part1),
        "mmu_part2": jnp.asarray(batch["input_ids"]),
        "mmu_labels": jnp.asarray(labels),
        "mmu_pixel_values": jnp.asarray(batch["images"]),
        "mmu_pixel_attention_mask": jnp.asarray(batch["pixel_attention_mask"]),
        "mmu_spatial_shapes": jnp.asarray(batch["spatial_shapes"]),
        "mmu_pos_embeds": jnp.asarray(pos),
        "mmu_prompt_len": jnp.asarray([3 + max_patches + l_conv] * b),
    }
    tx = make_optimizer(params, 1e-3, LRS.get_scheduler("constant"))
    tcfg = SFTStepConfig(batch_size_t2i=0, batch_size_lm=0, batch_size_mmu=b)
    step = jax.jit(make_sft_train_step(cfg, vq_cfg, vs_cfg, tx, tcfg))
    state = init_train_state(params, tx)
    state, metrics = step(state, MV.init(jax.random.key(1), vq_cfg), vs_params,
                          sft_batch, jax.random.key(0))
    assert np.isfinite(float(metrics["loss_mmu"]))
    assert int(state.step) == 1
