"""Data-layer tests against generated on-disk fixtures (NOCS file formats)."""
import json
import os
import pickle
from os.path import join

import numpy as np
import pytest

from oryon_tpu.data.augment import AugmentConfig, augment_pair
from oryon_tpu.data.bop import sym_set_from_info, symmetry_transformations
from oryon_tpu.data.datasets import (
    NocsReader, PairDataset, sample_correspondences, unique_matches,
)
from oryon_tpu.data.meshio import load_obj, load_ply
from oryon_tpu.models.tokenizer import ClipTokenizer


# ---------------------------------------------------------------- fixtures
@pytest.fixture(scope="module")
def nocs_root(tmp_path_factory):
    """Generate a miniature REAL275-format dataset tree (tests/_fixtures)."""
    from tests._fixtures import make_nocs_tree

    return make_nocs_tree(str(tmp_path_factory.mktemp("nocs")))


# ---------------------------------------------------------------- tests
def test_unique_matches():
    c = np.array([[1, 2, 3, 4], [1, 2, 3, 4], [5, 6, 7, 8]])
    u = unique_matches(c)
    assert u.shape == (2, 4)


def test_sample_correspondences_capacity(rng):
    rs = np.random.RandomState(0)
    corrs = rng.randint(0, 100, (30, 4))
    out, val, ok = sample_correspondences(rs, corrs, 64)
    assert ok and val.sum() <= 30 and out.shape == (64, 4)
    out2, val2, ok2 = sample_correspondences(rs, np.zeros((0, 4)), 64)
    assert not ok2 and not val2.any()


def test_nocs_reader_item(nocs_root):
    r = NocsReader(nocs_root)
    item = r.get_item(1, 0, "mug_1")
    assert item["rgb"].shape == (60, 80, 3) and item["rgb"].max() <= 1.0
    assert item["mask"].sum() == 400  # the 20x20 mask-id-7 region
    assert item["pose"][2, 3] == pytest.approx(0.8)
    assert item["cls_name"] == "mug"


def test_nocs_object_info(nocs_root):
    r = NocsReader(nocs_root)
    info = r.object_info(max_edge=10.0)
    obj = info["mug_1"]
    assert obj.pts.shape[1] == 3 and obj.pts.max() <= 51  # meters->mm
    assert obj.diameter == 86.6
    assert obj.syms.shape == (1, 3, 4)  # identity only
    assert obj.mesh is not None


def test_pair_dataset_batches(nocs_root):
    tok = ClipTokenizer()
    ds = PairDataset(NocsReader(nocs_root), "test_split", tok,
                     max_corrs=64, img_size=(56, 56), n_prompts=4)
    assert len(ds) == 2
    batches = list(ds.batches(batch_size=2))
    assert len(batches) == 1
    b = batches[0]
    assert b.anchor.rgb.shape == (2, 56, 56, 3)
    assert b.anchor.mask.shape == (2, 56, 56)
    assert b.corrs.shape == (2, 64, 4)
    assert b.prompt_ids.shape == (2, 3, 77)
    assert b.valid.sum() == 2
    assert b.rel_pose.shape == (2, 4, 4)
    # relative pose converted mm -> m
    assert float(b.rel_pose[0, 0, 3]) == pytest.approx(0.1)
    # corrs rescaled into the 56x56 frame
    valid_corrs = np.asarray(b.corrs[0])[np.asarray(b.corr_valid[0])]
    assert valid_corrs.max() < 56


def test_pair_dataset_pads_last_batch(nocs_root):
    tok = ClipTokenizer()
    ds = PairDataset(NocsReader(nocs_root), "test_split", tok,
                     max_corrs=16, img_size=(56, 56), n_prompts=3)
    batches = list(ds.batches(batch_size=4))
    b = batches[0]
    assert b.anchor.rgb.shape[0] == 4
    assert float(b.valid.sum()) == 2.0  # two real pairs, two invalid pads


def test_loader_multihost_shard_stays_disjoint_across_epochs(nocs_root):
    """The per-host strided split must stay disjoint/exhaustive on EVERY
    epoch — the shuffle seed is host-independent (base + epoch), immune to
    the data-dependent augmentation draws that desynchronize dataset.rs."""
    from oryon_tpu.data.loader import PrefetchLoader
    tok = ClipTokenizer()

    def make(rank):
        ds = PairDataset(NocsReader(nocs_root), "test_split", tok,
                         max_corrs=16, img_size=(56, 56), n_prompts=3,
                         augment=True, seed=7)
        return PrefetchLoader(ds, 1, shuffle=True,
                              process_index=rank, process_count=2)

    l0, l1 = make(0), make(1)
    for epoch in range(3):
        ids = []
        for ld in (l0, l1):
            for b in ld:
                ids.extend(str(i) for i in
                           np.asarray(b.instance_id)[np.asarray(b.valid) > 0])
        assert len(ids) == 2, (epoch, ids)
        assert len(set(ids)) == 2, (epoch, ids)


def test_augment_pair_flip_consistency(rng):
    H, W = 40, 48
    item_a = {"rgb": rng.rand(H, W, 3).astype(np.float32),
              "mask": (rng.rand(H, W) > 0.7).astype(np.uint8),
              "depth": rng.rand(H, W).astype(np.float32)}
    item_q = {k: v.copy() for k, v in item_a.items()}
    # a distinctive pixel to track through the flip
    item_a["rgb"][10, 5] = [9.0, 9.0, 9.0]
    corrs = np.array([[10, 5, 10, 5]], np.float64)
    cfg = AugmentConfig(jitter=False, bright=False, hflip=True, vflip=False,
                        prob=1.0, out_size=(H, W))
    rs = np.random.RandomState(0)
    a2, q2, c2 = augment_pair(rs, item_a, item_q, corrs, cfg)
    y1, x1 = int(round(c2[0, 0])), int(round(c2[0, 1]))
    assert a2["rgb"][y1, x1, 0] == pytest.approx(9.0, abs=1e-5)


def test_symmetry_expansion_continuous():
    info = {"diameter": 100.0,
            "symmetries_continuous": [{"axis": [0, 0, 1], "offset": [0, 0, 0]}]}
    syms = sym_set_from_info(info, 0.5)   # pi/0.5 -> 7 steps
    assert syms.shape[0] == 7
    # all are rotations about z: last row of R = [0,0,1]
    np.testing.assert_allclose(syms[:, 2, :3], np.tile([0, 0, 1], (7, 1)), atol=1e-9)


def test_symmetry_discrete():
    m = np.eye(4)
    m[0, 0] = m[1, 1] = -1
    info = {"symmetries_discrete": [m.flatten().tolist()]}
    syms = sym_set_from_info(info)
    assert syms.shape[0] == 2
    np.testing.assert_allclose(syms[0, :3, :3], np.eye(3))


def test_ply_roundtrip(tmp_path):
    path = str(tmp_path / "m.ply")
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n"
                "element vertex 3\n"
                "property float x\nproperty float y\nproperty float z\n"
                "property float nx\nproperty float ny\nproperty float nz\n"
                "element face 1\n"
                "property list uchar int vertex_indices\n"
                "end_header\n"
                "0 0 0 0 0 1\n1 0 0 0 0 1\n0 1 0 0 0 1\n"
                "3 0 1 2\n")
    from oryon_tpu.data.meshio import load_bop_object
    m = load_bop_object(path)
    assert m["pts"].shape == (3, 3)
    assert m["faces"].shape == (1, 3)
    np.testing.assert_allclose(m["normals"][:, 2], 1.0)


def test_obj_loader(tmp_path):
    path = str(tmp_path / "m.obj")
    with open(path, "w") as f:
        f.write("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1/1 2/2 3/3\n")
    V, F = load_obj(path)
    assert V.shape == (3, 3) and F.tolist() == [[0, 1, 2]]


def test_prefetch_loader(nocs_root):
    from oryon_tpu.data.loader import PrefetchLoader
    tok = ClipTokenizer()
    ds = PairDataset(NocsReader(nocs_root), "test_split", tok,
                     max_corrs=16, img_size=(56, 56), n_prompts=3)
    loader = PrefetchLoader(ds, batch_size=1)
    batches = list(iter(loader))
    assert len(batches) == 2
    assert batches[0].anchor.rgb.shape == (1, 56, 56, 3)
    # process sharding splits the work
    l0 = list(iter(PrefetchLoader(ds, 1, process_index=0, process_count=2)))
    l1 = list(iter(PrefetchLoader(ds, 1, process_index=1, process_count=2)))
    assert len(l0) == 1 and len(l1) == 1
    assert l0[0].instance_id[0] != l1[0].instance_id[0]


@pytest.fixture(scope="module")
def shapenet_root(tmp_path_factory):
    """Miniature ShapeNet6D-format tree (utils/data/shapenet.py formats)."""
    rs = np.random.RandomState(1)
    root = str(tmp_path_factory.mktemp("sn6d"))
    from PIL import Image

    H, W = 48, 64
    for sub in ("rgb", "mask", "depth"):
        os.makedirs(join(root, "raw_data", sub), exist_ok=True)
    annots = {}
    for img_id in (0, 1):
        Image.fromarray((rs.rand(H, W, 3) * 255).astype(np.uint8)).save(
            join(root, "raw_data", "rgb", f"{img_id:06d}.jpg"))
        mask = np.zeros((H, W), np.uint8)
        mask[10:30, 20:40] = 1  # obj_idx 1
        Image.fromarray(mask).save(join(root, "raw_data", "mask", f"{img_id:06d}.png"))
        Image.fromarray((rs.rand(H, W) * 900 + 400).astype(np.uint16)).save(
            join(root, "raw_data", "depth", f"{img_id:06d}.png"))
        annots[img_id] = {
            "K": np.array([[500, 0, 32], [0, 500, 24], [0, 0, 1]], np.float64),
            "obj_info_lst": [{}, {"cls_id": 7, "RT": np.eye(4)[:3]}],
        }
    with open(join(root, "scene_gt.pkl"), "wb") as f:
        pickle.dump(annots, f)
    with open(join(root, "metadata.csv"), "w") as f:
        f.write('fullId,x,category,wnlemmas,name,z\n')
        f.write('wss.abc123,0,chair,"chair,seat",chair_model,0\n')
    with open(join(root, "objnm2clsid.json"), "w") as f:
        json.dump({"abc123_0": 7}, f)
    return root


def test_shapenet_reader(shapenet_root):
    from oryon_tpu.data.datasets import Shapenet6DReader
    r = Shapenet6DReader(shapenet_root)
    item = r.get_item(0, 7)
    assert item["rgb"].shape == (48, 64, 3)
    assert item["mask"].sum() == 400
    assert item["cls_name"] == "chair"
    assert "seat" in item["cls_descs"]
    assert item["camera"][0, 0] == 500


def test_box_from_mask():
    from oryon_tpu.utils.misc import box_from_mask
    m = np.zeros((10, 12), np.uint8)
    m[2:5, 3:9] = 1
    assert box_from_mask(m) == (2, 3, 5, 9)
    assert box_from_mask(np.zeros((4, 4), np.uint8)) == (0, 0, 0, 0)


def test_nocs_reader_external_san_mask(nocs_root):
    from PIL import Image
    d = join(nocs_root, "san_name")
    os.makedirs(d, exist_ok=True)
    ext = np.zeros((60, 80), np.uint8)
    ext[25:35, 35:45] = 1
    Image.fromarray(ext).save(join(d, "1 0 mug_1.png"))
    r = NocsReader(nocs_root)
    item = r.get_item(1, 0, "mug_1", mask_type="san")
    assert item["mask"].sum() == 100


def test_asset_builders(nocs_root):
    import importlib.util as iu
    spec = iu.spec_from_file_location("assets", "scripts/make_dataset_assets.py")
    assets = iu.module_from_spec(spec)
    spec.loader.exec_module(assets)

    n = assets.build_detections(nocs_root)
    assert n == 3
    det = open(join(nocs_root, "split/real_test/scene_1/0000_detection.txt")).read()
    assert det.startswith("7 30 20")

    out = assets.build_models_info(nocs_root)
    info = json.load(open(out))
    assert "mug_1" in info and info["mug_1"]["diameter"] > 0
    assert "symmetries_continuous" not in info["mug_1"]  # mug isn't symmetric

    n = assets.build_normals(nocs_root)
    assert n == 1
    normals = np.loadtxt(join(nocs_root, "obj_models/real_test/mug_1_normals.txt"))
    np.testing.assert_allclose(np.linalg.norm(normals, axis=1), 1.0, atol=1e-5)


def test_vertex_normals_plane():
    import importlib.util as iu
    spec = iu.spec_from_file_location("assets", "scripts/make_dataset_assets.py")
    assets = iu.module_from_spec(spec)
    spec.loader.exec_module(assets)
    V = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float64)
    F = np.array([[0, 1, 2], [1, 3, 2]])
    n = assets.compute_vertex_normals(V, F)
    np.testing.assert_allclose(np.abs(n[:, 2]), 1.0, atol=1e-9)


def test_object_split_filter(nocs_root):
    with open(join(nocs_root, "object_splits.json"), "w") as f:
        json.dump({"all": [3], "none_split": [99]}, f)
    tok = ClipTokenizer()
    ds_all = PairDataset(NocsReader(nocs_root), "test_split", tok,
                         max_corrs=8, img_size=(56, 56), obj_split="all")
    assert len(ds_all) == 2
    ds_none = PairDataset(NocsReader(nocs_root), "test_split", tok,
                          max_corrs=8, img_size=(56, 56), obj_split="none_split")
    assert len(ds_none) == 0


def test_cached_reader_exact_and_isolated(nocs_root):
    """CachedReader must be a bit-exact, mutation-safe drop-in."""
    from oryon_tpu.data.cache import CachedReader

    direct = NocsReader(nocs_root)
    cached = CachedReader(NocsReader(nocs_root))
    a = direct.get_item(1, 0, "mug_1")
    b = cached.get_item(1, 0, "mug_1")     # miss
    c = cached.get_item(1, 0, "mug_1")     # hit
    assert cached.stats()["hits"] == 1 and cached.stats()["misses"] == 1
    for k in a:
        if isinstance(a[k], np.ndarray):
            assert a[k].dtype == b[k].dtype and np.array_equal(a[k], b[k]), k
            assert np.array_equal(b[k], c[k]), k
        else:
            assert a[k] == b[k] == c[k], k
    # downstream in-place mutation must not poison the cache
    b["rgb"] *= 0.0
    b["mask"][:] = 9
    d = cached.get_item(1, 0, "mug_1")
    assert np.array_equal(d["rgb"], a["rgb"]) and np.array_equal(d["mask"], a["mask"])
    # attribute passthrough: reader API surfaces intact
    assert cached.name == "nocs" and "mug_1" in cached.object_info(max_edge=10.0)
    # LRU bound: a tiny budget holds at most one item
    tiny = CachedReader(NocsReader(nocs_root), max_bytes=a["rgb"].nbytes)
    tiny.get_item(1, 0, "mug_1")
    tiny.get_item(1, 1, "mug_1")
    assert tiny.stats()["items"] <= 1
    e = tiny.get_item(1, 1, "mug_1")
    assert np.array_equal(e["depth"], direct.get_item(1, 1, "mug_1")["depth"])

    # PairDataset over a cached reader yields identical batches
    tok = ClipTokenizer()
    mk = lambda r: PairDataset(r, "test_split", tok, max_corrs=16,
                               img_size=(56, 56), n_prompts=3)
    b1 = next(mk(NocsReader(nocs_root)).batches(2))
    b2 = next(mk(CachedReader(NocsReader(nocs_root))).batches(2))
    for f in b1._fields:
        v1, v2 = getattr(b1, f), getattr(b2, f)
        if isinstance(v1, np.ndarray):
            assert np.array_equal(v1, v2), f


def test_prompt_description_modes(nocs_root):
    """test.add_description ablations (reference get_item_prompt,
    datasets.py:515-527): 'yes' prepends the first description, 'wrong' the
    second, 'desconly' replaces the class name with 'object'."""
    tok = ClipTokenizer()
    # fixture obj_names.json: cls_name='mug', cls_descs=['cup', 'coffee mug']
    def prompts(mode):
        ds = PairDataset(NocsReader(nocs_root), "test_split", tok,
                         max_corrs=8, img_size=(56, 56), n_prompts=3,
                         add_description=mode)
        return ds._prompts("mug", ["cup", "coffee mug"])

    assert prompts("no") == ["a photo of a mug", "a picture of a mug"]
    assert prompts("yes") == ["a photo of a cup mug", "a picture of a cup mug"]
    assert prompts("wrong") == ["a photo of a coffee mug mug",
                                "a picture of a coffee mug mug"]
    assert prompts("desconly") == ["a photo of a cup object",
                                   "a picture of a cup object"]
    # no descriptions available -> bare name, no crash
    ds = PairDataset(NocsReader(nocs_root), "test_split", tok,
                     max_corrs=8, img_size=(56, 56), n_prompts=3,
                     add_description="yes")
    assert ds._prompts("mug", []) == ["a photo of a mug", "a picture of a mug"]


def test_pair_dataset_drives_shapenet_reader(shapenet_root):
    """PairDataset must drive Shapenet6DReader end to end (the default
    TRAIN dataset — a reader-signature mismatch here crashes run_train)."""
    from oryon_tpu.data.datasets import Shapenet6DReader
    sp = join(shapenet_root, "fixed_split", "train_split")
    os.makedirs(sp, exist_ok=True)
    rs = np.random.RandomState(0)
    corrs = np.stack([rs.randint(10, 30, 30), rs.randint(20, 40, 30),
                      rs.randint(10, 30, 30), rs.randint(20, 40, 30)], 1)
    rel = np.eye(4)
    with open(join(sp, "instance_list.txt"), "w") as f:
        f.write("train, 0 0, 0 1, 7 chair\n")
    with open(join(sp, "annots.pkl"), "wb") as f:
        pickle.dump({"0_0_0_1_7_chair": {"gt": rel, "corrs": corrs}}, f)
    with open(join(shapenet_root, "templates.json"), "w") as f:
        json.dump(["a photo of a {}", "one {} in the scene"], f)

    tok = ClipTokenizer()
    ds = PairDataset(Shapenet6DReader(shapenet_root), "train_split", tok,
                     max_corrs=16, img_size=(48, 48), n_prompts=3,
                     augment=True, synset_aug=True, seed=0)
    assert len(ds) == 1
    b = next(ds.batches(1))
    assert b.anchor.rgb.shape == (1, 48, 48, 3)
    assert float(b.valid.sum()) == 1.0
    assert b.prompt_ids.shape[0] == 1


@pytest.fixture(scope="module")
def toyl_root(tmp_path_factory):
    """Miniature Toyota-Light BOP-format tree."""
    rs = np.random.RandomState(3)
    root = str(tmp_path_factory.mktemp("toyl"))
    from PIL import Image

    H, W = 48, 64
    scene, img = 1, 0
    base = join(root, "split", "test", f"{scene:06d}")
    for sub in ("rgb", "depth", "mask_visib"):
        os.makedirs(join(base, sub), exist_ok=True)
    Image.fromarray((rs.rand(H, W, 3) * 255).astype(np.uint8)).save(
        join(base, "rgb", f"{img:06d}.png"))
    Image.fromarray((rs.rand(H, W) * 900 + 400).astype(np.uint16)).save(
        join(base, "depth", f"{img:06d}.png"))
    mask = np.zeros((H, W), np.uint8)
    mask[10:30, 20:40] = 1
    Image.fromarray(mask).save(join(base, "mask_visib", f"{img:06d}.png"))
    pose = np.eye(4)[:3]
    with open(join(base, "scene_gt.json"), "w") as f:
        json.dump({str(img): [{"obj_id": 5,
                               "cam_R_m2c": pose[:, :3].reshape(-1).tolist(),
                               "cam_t_m2c": [0, 0, 800.0]}]}, f)
    with open(join(base, "scene_gt_info.json"), "w") as f:
        json.dump({str(img): [{"bbox_visib": [20, 10, 20, 20]}]}, f)
    with open(join(root, "models_name.json"), "w") as f:
        json.dump({"5": ["duck", "toy duck"]}, f)
    return root


def test_toyl_reader_item_and_intrinsics(toyl_root):
    """TOYL uses the Linemod intrinsics (reference datasets.py:573) — NOT
    the REAL275/NOCS camera; get_item round-trips the BOP layout."""
    from oryon_tpu.data.datasets import ToylReader
    r = ToylReader(toyl_root)
    np.testing.assert_allclose(r.K[0, 0], 572.4114)
    np.testing.assert_allclose(r.K[1, 2], 242.0489)
    item = r.get_item(1, 0, 5)
    assert item["rgb"].shape == (48, 64, 3)
    assert item["mask"].sum() == 400
    assert item["pose"][2, 3] == pytest.approx(0.8)  # mm -> m
    assert item["cls_name"] == "duck"


def test_train_collate_and_u8_cache(nocs_root):
    """train=True collate skips eval-only fields (no H2D for depth/pose);
    rgb_u8 CachedReader feeds collate uint8 with identical wire bytes; the
    prompt-id cache memoizes BPE."""
    from oryon_tpu.data.cache import CachedReader
    from oryon_tpu.data.loader import PrefetchLoader
    from oryon_tpu.data.pair_batch import train_fields

    tok = ClipTokenizer()
    mk = lambda r: PairDataset(r, "test_split", tok, max_corrs=16,
                               img_size=(56, 56), n_prompts=3)
    ds_f32 = mk(NocsReader(nocs_root))
    ds_u8 = mk(CachedReader(NocsReader(nocs_root), rgb_u8=True))

    pairs_f = [ds_f32.get_pair(i) for i in (0, 1)]
    full = ds_f32.collate(pairs_f)
    tr = ds_f32.collate(pairs_f, train=True)
    for v in (tr.anchor, tr.query):
        assert v.depth is None and v.orig_depth is None and v.eval_depth is None
        assert v.camera is None and v.pose is None and v.size is None
    assert tr.rel_pose is None
    np.testing.assert_array_equal(np.asarray(tr.anchor.rgb),
                                  np.asarray(full.anchor.rgb))
    np.testing.assert_array_equal(np.asarray(tr.corrs), np.asarray(full.corrs))

    # u8 cache path: on a tree that needs a host resize the u8 bilinear may
    # land within 1 LSB of the f32-resize-then-quantize wire bytes (fp
    # rounding at quantization boundaries); pre-sized production trees hit
    # the identity-resize path and are exact (checked below).
    # (warm the cache first so the u8 fast path is exercised on the hit)
    [ds_u8.get_pair(i) for i in (0, 1)]
    pairs_u = [ds_u8.get_pair(i) for i in (0, 1)]
    assert pairs_u[0]["item_a"]["rgb"].dtype == np.uint8
    tr_u = ds_u8.collate(pairs_u, train=True)
    diff = (np.asarray(tr_u.anchor.rgb).astype(np.int16)
            - np.asarray(tr.anchor.rgb).astype(np.int16))
    assert np.abs(diff).max() <= 1

    # pre-sized (identity-resize) path: bit-exact u8 round-trip
    mk60 = lambda r: PairDataset(r, "test_split", tok, max_corrs=16,
                                 img_size=(60, 80), n_prompts=3)
    ds60_f = mk60(NocsReader(nocs_root))
    ds60_u = mk60(CachedReader(NocsReader(nocs_root), rgb_u8=True))
    [ds60_u.get_pair(i) for i in (0, 1)]
    b_f = ds60_f.collate([ds60_f.get_pair(i) for i in (0, 1)], train=True)
    b_u = ds60_u.collate([ds60_u.get_pair(i) for i in (0, 1)], train=True)
    np.testing.assert_array_equal(np.asarray(b_u.anchor.rgb),
                                  np.asarray(b_f.anchor.rgb))

    # prompt-id cache: second collate of the same prompts hits the memo
    n0 = len(ds_f32._prompt_id_cache)
    assert n0 >= 1
    ds_f32.collate(pairs_f)
    assert len(ds_f32._prompt_id_cache) == n0

    # train_fields drops prompt_ids only once text_emb is present
    tf = train_fields(tr)
    assert tf.prompt_ids is not None and tf.cls_id is None
    tf2 = train_fields(tr._replace(text_emb=np.zeros((2, 3, 8), np.float32)))
    assert tf2.prompt_ids is None and tf2.text_emb is not None

    # PrefetchLoader(train=True) emits train-collated batches
    lb = next(iter(PrefetchLoader(ds_u8, 2, train=True)))
    assert lb.anchor.depth is None and lb.rel_pose is None
