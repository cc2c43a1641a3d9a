"""Data pipeline tests: transforms, augmenters, folder/tar datasets, mixture,
end-to-end into the FourM model."""

import io
import json
import os
import tarfile

import numpy as np
import pytest
from PIL import Image

from fourm_tpu.data.augmenters import (
    CenterCropImageAugmenter,
    PreTokenizedImageAugmenter,
    RandomCropImageAugmenter,
    random_resized_crop_params,
)
from fourm_tpu.data.datasets import (
    MixtureDataset,
    MultiModalDatasetFolder,
    ShardedTarDataset,
    batched_loader,
    braceexpand,
    build_fm_pretraining_dataset,
    iterate_multi_tar_samples,
    repeat_dataset,
)
from fourm_tpu.data.modality_info import MODALITY_INFO
from fourm_tpu.data.transforms import (
    CaptionTransform,
    DepthTransform,
    DetectionTransform,
    MaskTransform,
    MetadataTransform,
    RGBTransform,
    SemsegTransform,
    TokTransform,
    UnifiedDataTransform,
    bbox_ops,
    default_modality_transforms,
)


class TestBraceExpand:
    def test_range(self):
        assert braceexpand("s/{00..02}.tar") == ["s/00.tar", "s/01.tar", "s/02.tar"]

    def test_list(self):
        assert braceexpand("root_{rgb,cap}/0.tar") == ["root_rgb/0.tar", "root_cap/0.tar"]

    def test_nested(self):
        assert len(braceexpand("{a,b}/{0..1}.tar")) == 4

    def test_plain(self):
        assert braceexpand("x.tar") == ["x.tar"]


class TestTransforms:
    def test_rgb_normalization(self):
        t = RGBTransform(imagenet_default_mean_and_std=True)
        img = Image.new("RGB", (32, 32), (124, 116, 104))
        out = t.postprocess(t.preprocess(img))
        assert out.shape == (32, 32, 3)
        assert abs(out.mean()) < 0.2  # roughly centered

    def test_depth_standardization(self):
        t = DepthTransform(standardize_depth=True)
        arr = (np.random.rand(16, 16) * 65535).astype(np.uint16)
        img = Image.fromarray(arr, mode="I;16")
        out = t.postprocess(img)
        assert out.shape == (16, 16, 1)
        assert abs(out.mean()) < 1.0

    def test_semseg_shift(self):
        t = SemsegTransform(shift_idx_by_one=True)
        img = Image.fromarray(np.zeros((8, 8), np.uint8), mode="P")
        out = t.postprocess(t.preprocess(img))
        assert out.dtype == np.int64
        assert (out == 1).all()

    def test_mask_pooling(self):
        t = MaskTransform(mask_pool_size=2)
        arr = np.ones((8, 8), np.uint8) * 255
        arr[0, 0] = 0
        out = t.postprocess(Image.fromarray(arr))
        assert out.shape == (8, 8, 1)
        assert not out[0, 0, 0] and not out[1, 1, 0]  # pooled min expands the hole
        assert out[4, 4, 0]

    def test_detection_to_string(self):
        t = DetectionTransform(det_threshold=0.5)
        sample = {"instances": [
            {"boxes": [0.1, 0.2, 0.5, 0.6], "class_name": "dog", "score": 0.9},
            {"boxes": [0.3, 0.3, 0.4, 0.4], "class_name": "cat", "score": 0.3},
        ]}
        bboxes = t.preprocess(sample)
        assert len(bboxes) == 1  # below-threshold dropped
        aug = t.image_augment(bboxes, (0, 0, 100, 100), False, (100, 100), (224, 224))
        s = t.postprocess(aug)
        assert s.startswith("v0=") and "dog" in s and "v3=" in s

    def test_bbox_hflip(self):
        out = bbox_ops.hflip((0.1, 0.2, 0.5, 0.6))
        np.testing.assert_allclose(out, (0.5, 0.2, 0.9, 0.6))

    def test_metadata_chunks(self):
        t = MetadataTransform(shuffle=False, return_chunks=True)
        chunks = t.postprocess({"brightness": 128.0, "n_humans": 2})
        assert any("v1=10" in c for c in chunks)
        assert any("v1=5 v0=2" in c for c in chunks)

    def test_caption_rand_aug_select(self):
        t = CaptionTransform(aligned_captions=True)
        out = t.image_augment(["a", "b", "c"], None, False, None, None, rand_aug_idx=2)
        assert out == "c"

    def test_tok_transform_requires_idx(self):
        t = TokTransform()
        with pytest.raises(ValueError):
            t.image_augment(np.zeros((3, 196)), None, False, None, None, rand_aug_idx=None)
        out = t.image_augment(np.arange(6).reshape(3, 2), None, False, None, None, rand_aug_idx=1)
        np.testing.assert_array_equal(out, [2, 3])


class TestAugmenters:
    def test_random_resized_crop_in_bounds(self):
        for _ in range(50):
            top, left, h, w = random_resized_crop_params(100, 80, (0.2, 1.0), (0.75, 1.333))
            assert 0 <= top <= 100 - h and 0 <= left <= 80 - w

    def test_center_crop_square(self):
        aug = CenterCropImageAugmenter(target_size=224)
        img = Image.new("RGB", (100, 60))
        (top, left, h, w), flip, orig, tgt, idx = aug({"rgb": img})
        assert h == w == 60 and top == 0 and left == 20

    def test_pretokenized_uses_crop_settings(self):
        aug = PreTokenizedImageAugmenter(target_size=224)
        settings = np.array([[0, 0, 50, 50, 0], [10, 10, 40, 40, 1]])
        coords, flip, _, _, idx = aug({}, settings)
        assert idx in (0, 1)
        assert coords == tuple(settings[idx][:4])


def make_folder_dataset(root, n=4):
    """rgb pngs + captions + pre-tokenized rgb tokens + crop settings."""
    rng = np.random.RandomState(0)
    os.makedirs(f"{root}/rgb/c", exist_ok=True)
    os.makedirs(f"{root}/caption/c", exist_ok=True)
    os.makedirs(f"{root}/tok_rgb/c", exist_ok=True)
    os.makedirs(f"{root}/crop_settings/c", exist_ok=True)
    for i in range(n):
        Image.fromarray(rng.randint(0, 255, (64, 64, 3), dtype=np.uint8)).save(
            f"{root}/rgb/c/{i:04d}.png")
        with open(f"{root}/caption/c/{i:04d}.txt", "w") as f:
            f.write(f"a photo number {i}")
        np.save(f"{root}/tok_rgb/c/{i:04d}.npy",
                rng.randint(0, 16384, (3, 196)).astype(np.int16))
        np.save(f"{root}/crop_settings/c/{i:04d}.npy",
                np.array([[0, 0, 64, 64, 0], [8, 8, 48, 48, 1], [0, 0, 56, 56, 0]]))


class TestFolderDataset:
    def test_aligned_loading(self, tmp_path):
        make_folder_dataset(str(tmp_path))
        transforms = default_modality_transforms()
        ds = MultiModalDatasetFolder(
            str(tmp_path), ["rgb@224", "caption"], transforms,
            modality_paths={"rgb@224": "rgb"},
        )
        assert len(ds) == 4
        sample = ds[0]
        assert isinstance(sample["caption"], str)
        assert sample["rgb@224"].size == (64, 64)

    def test_end_to_end_folder_to_model(self, tmp_path, ):
        """Folder -> unified transform -> masking -> batch -> FourM loss."""
        import jax
        import jax.numpy as jnp
        from fourm_tpu.data.masking import UnifiedMasking
        from fourm_tpu.models import FourM, create_fourm_config
        from fourm_tpu.utils.text_tokenizer import (
            generate_sentinel_tokens,
            train_unified_wordpiece_tokenizer,
        )

        make_folder_dataset(str(tmp_path / "data"))
        corpus = tmp_path / "corpus.txt"
        corpus.write_text("a photo number one two three\n" * 100)
        tok = train_unified_wordpiece_tokenizer(
            str(corpus), vocab_size=300,
            sentinel_tokens=generate_sentinel_tokens(num=10), show_progress=False,
        )
        mods = ["tok_rgb@224", "caption"]
        masking = UnifiedMasking(
            modality_info={m: MODALITY_INFO[m] for m in mods},
            text_tokenizer=tok, input_tokens_range=(32, 32), target_tokens_range=(32, 32),
            input_alphas={m: 0.5 for m in mods}, target_alphas={m: 0.5 for m in mods},
            seed=0,
        )
        aug = PreTokenizedImageAugmenter(target_size=224, main_domain="rgb")
        ds = build_fm_pretraining_dataset(
            str(tmp_path / "data"), mods + ["crop_settings"],
            default_modality_transforms(), aug, masking,
        )
        loader = batched_loader(repeat_dataset(ds), batch_size=2)
        batch = next(loader)
        assert batch["tok_rgb@224"]["tensor"].shape == (2, 196)
        assert batch["caption"]["tensor"].shape == (2, 514)

        cfg = create_fourm_config(
            "fm_tiny_6e_6d_gelu", encoder_modalities=tuple(mods),
            decoder_modalities=tuple(mods),
        )
        model = FourM(cfg)
        jbatch = jax.tree.map(jnp.asarray, batch)
        params = model.init(jax.random.key(0), jbatch, 32, 32)
        loss, _ = model.apply(params, jbatch, 32, 32)
        assert np.isfinite(float(loss))


def make_tar_shards(root, n_shards=2, samples_per_shard=3):
    rng = np.random.RandomState(0)
    os.makedirs(f"{root}/shards_rgb", exist_ok=True)
    os.makedirs(f"{root}/shards_caption", exist_ok=True)
    for s in range(n_shards):
        with tarfile.open(f"{root}/shards_rgb/{s:05d}.tar", "w") as tf_rgb, \
             tarfile.open(f"{root}/shards_caption/{s:05d}.tar", "w") as tf_cap:
            for i in range(samples_per_shard):
                key = f"{s:05d}{i:04d}"
                buf = io.BytesIO()
                Image.fromarray(rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)).save(buf, "PNG")
                info = tarfile.TarInfo(f"{key}.png")
                info.size = buf.getbuffer().nbytes
                buf.seek(0)
                tf_rgb.addfile(info, buf)
                cap = json.dumps(f"caption {key}").encode()
                info = tarfile.TarInfo(f"{key}.json")
                info.size = len(cap)
                tf_cap.addfile(info, io.BytesIO(cap))


class TestTarStreaming:
    def test_multi_tar_merging(self, tmp_path):
        make_tar_shards(str(tmp_path))
        urls = [f"{tmp_path}/shards_[rgb,caption]/{s:05d}.tar" for s in range(2)]
        samples = list(iterate_multi_tar_samples(urls))
        assert len(samples) == 6
        assert "rgb.png" in samples[0] and "caption.json" in samples[0]

    def test_sharded_dataset_decodes(self, tmp_path):
        make_tar_shards(str(tmp_path))
        transforms = default_modality_transforms()
        ds = ShardedTarDataset(
            f"{tmp_path}/shards_[rgb,caption]/{{00000..00001}}.tar",
            ["rgb@224", "caption"], transforms, shuffle_buffer=1, seed=0,
        )
        it = iter(ds)
        sample = next(it)
        assert isinstance(sample["caption"], str)
        assert sample["rgb@224"].size == (32, 32)


class TestMixture:
    def test_empty_mod_padding(self):
        mods = {m: MODALITY_INFO[m] for m in ["tok_rgb@224", "caption"]}

        def gen_a():
            while True:
                yield {"tok_rgb@224": {
                    "tensor": np.zeros(196, np.int32),
                    "input_mask": np.zeros(196, bool),
                    "target_mask": np.ones(196, bool),
                    "decoder_attention_mask": np.zeros(196, np.int32),
                }}

        mix = MixtureDataset([gen_a()], [1.0], mods, seed=0)
        sample = next(iter(mix))
        assert set(sample) == {"tok_rgb@224", "caption"}
        assert sample["caption"]["input_mask"].all()  # padded modality fully masked
        assert sample["caption"]["tensor"].shape == (514,)


class TestNativeTarReader:
    def test_native_matches_python(self, tmp_path):
        from fourm_tpu.native import NativeTarFile, native_available, native_tar_samples

        if not native_available():
            pytest.skip("no g++ / native build unavailable")
        make_tar_shards(str(tmp_path), n_shards=1, samples_per_shard=3)
        path = f"{tmp_path}/shards_rgb/00000.tar"

        native = list(native_tar_samples(path))
        import tarfile as _tf

        with _tf.open(path) as tf:
            members = [(m.name, tf.extractfile(m).read()) for m in tf if m.isfile()]
        assert len(native) == 3
        flat_native = {}
        for s in native:
            for k, v in s.items():
                if k != "__key__":
                    flat_native[f"{s['__key__']}.{k}"] = v
        for name, data in members:
            assert flat_native[name] == data, name

    def test_native_speed_sanity(self, tmp_path):
        """Native reader should index + read a shard without error at scale."""
        from fourm_tpu.native import NativeTarFile, native_available

        if not native_available():
            pytest.skip("no native build")
        import tarfile as _tf
        import io as _io

        path = str(tmp_path / "big.tar")
        with _tf.open(path, "w") as tf:
            payload = os.urandom(1000)
            for i in range(500):
                info = _tf.TarInfo(f"{i:06d}.bin")
                info.size = len(payload)
                tf.addfile(info, _io.BytesIO(payload))
        with NativeTarFile(path) as nt:
            assert len(nt.names) == 500
            assert nt.read(499) == payload


class TestParallelLoading:
    def test_prefetch_iterator(self):
        from fourm_tpu.data.datasets import prefetch_iterator

        out = list(prefetch_iterator(iter(range(20)), prefetch=4))
        assert out == list(range(20))

    def test_parallel_map_dataset(self, tmp_path):
        from fourm_tpu.data.datasets import ParallelMapDataset

        make_folder_dataset(str(tmp_path))
        transforms = default_modality_transforms()
        ds = MultiModalDatasetFolder(
            str(tmp_path), ["caption"], transforms,
        )
        pds = ParallelMapDataset(ds, num_workers=2)
        it = pds.iter_shuffled(seed=0)
        samples = [next(it) for _ in range(8)]  # 2 epochs of 4
        assert all(isinstance(s["caption"], str) for s in samples)


def test_save_vq_tokens_with_teacher(tmp_path):
    """CLIP-teacher pre-tokenization path (reference save_vq_tokens.py:270-287):
    features from the teacher ViT feed the feature tokenizer."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from fourm_tpu.cli.save_vq_tokens import tokenize_folder
    from fourm_tpu.vq import VQ
    from fourm_tpu.vq.teachers import ViTTeacher

    root = tmp_path / "data" / "CLIP-B16" / "cls"
    root.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(2):
        Image.fromarray((rng.rand(64, 48, 3) * 255).astype(np.uint8)).save(
            root / f"img{i}.jpg")

    teacher_model = ViTTeacher(image_size=32, patch_size=8, width=64, depth=1,
                               num_heads=2, act_name="quick_gelu", pre_norm=True,
                               patch_bias=False, output_dim=16)
    tvars = teacher_model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    teacher = jax.jit(lambda x: teacher_model.apply(tvars, x))

    model = VQ(image_size=32, patch_size=8, enc_type="vit_t_enc", codebook_size=32,
               latent_dim=8, n_channels=16, patch_proj=False, image_size_enc=4)
    feats0 = teacher(jnp.zeros((1, 32, 32, 3)))
    variables = model.init({"params": jax.random.key(0), "rng": jax.random.key(1)}, feats0)

    out_dir = tmp_path / "tokens"
    n = tokenize_folder(model, variables, str(tmp_path / "data"), "CLIP-B16",
                        str(out_dir), input_size=32, n_crops=2, teacher=teacher)
    assert n == 2
    toks = np.load(next(out_dir.rglob("*.npy")))
    assert toks.shape == (2, 16)  # 2 crops x 4x4 feature positions
    assert toks.dtype == np.int16


def test_remote_shard_streaming_over_http(tmp_path):
    """http(s):// tar shard streaming through the reader (the s3:// path uses
    the same open_url seam, gated on boto3 availability)."""
    import http.server
    import tarfile
    import threading

    from fourm_tpu.data.datasets import _tar_samples
    from fourm_tpu.utils.remote import is_remote, split_s3_path

    # build a tiny webdataset-style tar
    tar_path = tmp_path / "000000.tar"
    with tarfile.open(tar_path, "w") as tf:
        for key in ("a0", "a1"):
            data = f"payload-{key}".encode()
            info = tarfile.TarInfo(f"{key}.txt")
            info.size = len(data)
            import io as _io

            tf.addfile(info, _io.BytesIO(data))

    handler = type("H", (http.server.SimpleHTTPRequestHandler,), {
        "directory": str(tmp_path),
        "log_message": lambda self, *a: None,
    })
    server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), 
        lambda *a, **k: handler(*a, directory=str(tmp_path), **k))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        url = f"http://127.0.0.1:{server.server_port}/000000.tar"
        samples = list(_tar_samples(url))
        assert [s["__key__"] for s in samples] == ["a0", "a1"]
        assert samples[0]["txt"] == b"payload-a0"
    finally:
        server.shutdown()

    assert is_remote("s3://bucket/shard.tar")
    assert split_s3_path("s3://bucket/a/b.tar") == ("bucket", "a/b.tar")
    with pytest.raises(ImportError):
        from fourm_tpu.utils.remote import open_url

        open_url("s3://bucket/shard.tar")


def test_save_vq_tokens_corrupt_log_flow(tmp_path):
    """Failures append to the corrupt log; a pre-existing log restricts the
    run to exactly those ids (reference save_vq_tokens.py:98-115)."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from fourm_tpu.cli.save_vq_tokens import tokenize_folder
    from fourm_tpu.vq import VQ

    root = tmp_path / "data" / "rgb" / "cls"
    root.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(2):
        Image.fromarray((rng.rand(48, 48, 3) * 255).astype(np.uint8)).save(
            root / f"img{i}.jpg")
    (root / "bad.jpg").write_bytes(b"not an image at all")

    model = VQ(image_size=32, patch_size=8, enc_type="vit_t_enc", codebook_size=32,
               latent_dim=8)
    variables = model.init({"params": jax.random.key(0), "rng": jax.random.key(1)},
                           jnp.zeros((1, 32, 32, 3)))
    out_dir = tmp_path / "tokens"
    log = tmp_path / "corrupt.log"
    n = tokenize_folder(model, variables, str(tmp_path / "data"), "rgb",
                        str(out_dir), input_size=32, n_crops=1,
                        corrupt_samples_log=str(log))
    assert n == 2
    corrupt_ids = [l.strip() for l in open(log)]
    assert len(corrupt_ids) == 1 and "bad" in corrupt_ids[0]

    # second pass: only the corrupt id is attempted (still fails, re-logged)
    n2 = tokenize_folder(model, variables, str(tmp_path / "data"), "rgb",
                         str(out_dir), input_size=32, n_crops=1,
                         corrupt_samples_log=str(log))
    assert n2 == 0


def _loader_factory(worker_id, num_workers):
    # module-level (picklable); distinct streams per worker
    for i in range(3):
        yield {"worker": worker_id, "i": i}


def test_multiprocess_loader_interleaves_workers():
    from fourm_tpu.data import MultiprocessLoader

    items = list(MultiprocessLoader(_loader_factory, num_workers=2,
                                    max_items_per_worker=3))
    assert len(items) == 6
    assert {it["worker"] for it in items} == {0, 1}
    # inline mode matches torch DataLoader num_workers=0 semantics
    inline = list(MultiprocessLoader(_loader_factory, num_workers=0))
    assert len(inline) == 3


def _crashing_factory(worker_id, num_workers):
    yield {"ok": True}
    raise ValueError("boom")


def test_multiprocess_loader_surfaces_worker_errors():
    from fourm_tpu.data import MultiprocessLoader

    with pytest.raises(RuntimeError, match="boom"):
        list(MultiprocessLoader(_crashing_factory, num_workers=1))


def test_sharded_tar_n_repeats(tmp_path):
    """wds_n_repeats: each decoded sample is emitted n times, each repeat
    passing the (stochastic) transform independently (reference
    unified_datasets.py:376-381)."""
    import io
    import itertools
    import tarfile

    from fourm_tpu.data.datasets import ShardedTarDataset

    tar = tmp_path / "000000.tar"
    with tarfile.open(tar, "w") as tf:
        for key in ("s0", "s1"):
            data = key.encode()
            info = tarfile.TarInfo(f"{key}.doc.txt")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))

    counter = itertools.count()
    ds = ShardedTarDataset(
        str(tar), ["doc"], {"doc": object()},
        transform=lambda s: {**s, "draw": next(counter)},
        shuffle_buffer=1, resample=False, n_repeats=3, shuffle_buffer_repeat=1,
    )
    out = list(ds)
    assert len(out) == 6
    from collections import Counter

    assert Counter(s["doc"] for s in out) == {"s0": 3, "s1": 3}
    assert len({s["draw"] for s in out}) == 6  # transform ran per repeat


def test_build_parallel_train_loader_workers(tmp_path):
    """build_parallel_train_loader: inline (0) and 2-process loading produce
    batched mod dicts from the same folder dataset config."""
    from fourm_tpu.data.pretrain_utils import build_parallel_train_loader
    from fourm_tpu.utils.text_tokenizer import (
        generate_sentinel_tokens,
        train_unified_wordpiece_tokenizer,
    )

    make_folder_dataset(str(tmp_path / "data"))
    corpus = tmp_path / "corpus.txt"
    corpus.write_text("a photo number one two three\n" * 100)
    tok = train_unified_wordpiece_tokenizer(
        str(corpus), vocab_size=300,
        sentinel_tokens=generate_sentinel_tokens(num=10), show_progress=False)
    tok_path = str(tmp_path / "tok.json")
    tok.save(tok_path)

    cfgs = {"d0": {
        "type": "multimodal",
        "in_domains": "tok_rgb@224-caption", "out_domains": "tok_rgb@224-caption",
        "input_alphas": "0.5", "target_alphas": "0.5",
        "data_path": str(tmp_path / "data"), "weight": 1.0,
    }}
    for workers in (0, 2):
        loader = build_parallel_train_loader(
            cfgs, ["caption", "tok_rgb@224"], batch_size=2, input_size=224,
            num_input_tokens=32, num_target_tokens=32,
            text_tokenizer_path=tok_path, seed=0, num_workers=workers)
        batch = next(iter(loader)) if workers == 0 else next(iter(loader))
        assert set(batch) >= {"caption", "tok_rgb@224"}
        assert batch["tok_rgb@224"]["tensor"].shape[0] == 2
