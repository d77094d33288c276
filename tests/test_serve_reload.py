"""Registry hot reload (serve --reload-poll-s): a newly activated model in
the ml_models registry swaps into a live server without dropping traffic.

The reference's registry has an is_active flag that nothing ever reads
(database_setup.py:54-64); here activation is live. These tests drive the
poller's check_once() core directly (the thread is check_once on a timer)
over a real HTTP socket.
"""

import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import pytest

from hhrs_tpu.config import ModelConfig, TrainConfig
from hhrs_tpu.data import Preprocessor, add_engineered_features
from hhrs_tpu.data.ingest import noise_filter
from hhrs_tpu.data.synthetic import generate_synthetic_dataset
from hhrs_tpu.db.registry import ModelRegistry, create_schema, connect
from hhrs_tpu.models.dcn import ModelDims
from hhrs_tpu.serve.engine import RecommendationEngine
from hhrs_tpu.serve.http import make_handler
from hhrs_tpu.serve.reload import RegistryReloader, SwappableEngine
from hhrs_tpu.train.artifacts import export_artifacts, load_artifact_bundle
from hhrs_tpu.train.trainer import train_dcn


@pytest.fixture(scope="module")
def reload_setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("reload")
    ds = generate_synthetic_dataset(n_users=120, n_items=60, n_reviews=2500, seed=44)
    main_df = add_engineered_features(
        ds.reviews.rename(columns={"guest_id": "user_id", "hotel_id": "item_id"})
    )
    splits, art = Preprocessor().fit_transform(noise_filter(main_df.copy()))
    dims = ModelDims.from_artifacts(art)
    mcfg = ModelConfig(emb_dim=8, hidden_dim=32, n_cross_layers=1, n_res_blocks=1)
    dirs = []
    for seed in (0, 1):  # two differently-initialized models
        r = train_dcn(splits, dims, mcfg,
                      TrainConfig(lr=3e-3, batch_size=256, n_epochs=1, seed=seed))
        out = str(tmp / f"artifacts_{seed}")
        export_artifacts(out, r.params, r.bn_state, mcfg, dims, art, r.final_metrics)
        dirs.append(out)

    db = str(tmp / "reg.sqlite")
    conn = connect(db)
    create_schema(conn)
    conn.close()

    def build(adir):
        eng = RecommendationEngine(load_artifact_bundle(adir), main_df, ds.friendships)
        eng.artifacts_dir = adir
        return eng

    return dirs, db, build, main_df


def _get(url):
    with urllib.request.urlopen(url) as r:
        return json.loads(r.read().decode())


def test_hot_reload_swaps_active_model(reload_setup):
    (dir_a, dir_b), db, build, _ = reload_setup
    reg = ModelRegistry(db)
    import os

    reg.register("v_a", dir_a, activate=True)
    spec = f"registry:{db}"
    dir_a_abs, dir_b_abs = os.path.abspath(dir_a), os.path.abspath(dir_b)

    holder = SwappableEngine(build(dir_a_abs))
    reloader = RegistryReloader(holder, spec, build, poll_s=3600,
                                current_dir=dir_a_abs)

    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(holder))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        assert _get(base + "/healthz")["model"] == dir_a_abs
        # no registry change → no swap
        assert reloader.check_once() is False
        assert _get(base + "/healthz")["model"] == dir_a_abs

        reg.register("v_b", dir_b, activate=True)
        assert reloader.check_once() is True
        h = _get(base + "/healthz")
        assert h["model"] == dir_b_abs and h["status"] == "ok"

        # traffic flows on the new model
        uni = holder.gen.universe
        req = urllib.request.Request(
            base + "/recommendations",
            data=json.dumps({"user_id": int(uni.user_ids[0]), "city": uni.cities[0],
                             "type": "friends", "lambda_param": 1.0}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            assert r.status == 200 and "ranked_hotels" in json.loads(r.read().decode())
    finally:
        server.shutdown()


def test_failed_reload_keeps_serving(reload_setup):
    """Activating a broken registration must NOT take the server down or
    change the served model (startup is fail-fast; a running server never
    kills itself over a bad swap)."""
    (dir_a, _), db, build, _ = reload_setup
    import os

    dir_a_abs = os.path.abspath(dir_a)
    reg = ModelRegistry(db)
    reg.register("v_good", dir_a, activate=True)
    holder = SwappableEngine(build(dir_a_abs))
    reloader = RegistryReloader(holder, f"registry:{db}", build, poll_s=3600,
                                current_dir=dir_a_abs)

    reg.register("v_broken", str(dir_a) + "_nonexistent", activate=True)
    assert reloader.check_once() is False  # load failed → keep current
    assert holder.artifacts_dir == dir_a_abs
    uni = holder.gen.universe
    res = holder.recommend(int(uni.user_ids[0]), uni.cities[0], "friends", 1.0)
    assert "ranked_hotels" in res

    # a later good registration recovers — and it SWAPS even though the
    # artifact dir is the same one already serving: the swap key is the
    # registration (model_id), so a retrain exported over the same
    # directory is picked up (path-only keying would miss it forever)
    reg.register("v_good_2", dir_a, activate=True)
    assert reloader.check_once() is True
    assert holder.artifacts_dir == dir_a_abs
    res = holder.recommend(int(uni.user_ids[0]), uni.cities[0], "friends", 1.0)
    assert "ranked_hotels" in res


def test_post_boot_reregister_over_same_dir_swaps(reload_setup):
    """r4 review finding: when the reloader's INIT registry read failed,
    the adopt branch must only adopt a registration that PREDATES boot —
    a post-boot re-register over the same dir is a new snapshot (new
    weights on disk) and must rebuild+swap."""
    dirs, db, build, _ = reload_setup
    from hhrs_tpu.db.registry import ModelRegistry

    reg = ModelRegistry(db)
    reg.register("adopt-v1", dirs[0])
    built = []

    def counting_build(adir):
        built.append(adir)
        return build(adir)

    holder = SwappableEngine(build(dirs[0]))
    reloader = RegistryReloader(holder, f"registry:{db}", counting_build,
                                poll_s=3600, current_dir=dirs[0])
    # simulate "init couldn't read the registry" (transient lock)
    reloader.current_key = (None, dirs[0])

    # pre-boot registration over the same dir: adopt, no rebuild
    assert reloader.check_once() is False
    assert built == []
    assert reloader.current_key[0] is not None  # key adopted

    # now a POST-boot re-register over the SAME dir (fresh snapshot):
    reloader.current_key = (None, dirs[0])  # init-failed state again
    reloader._boot_at = 0.0  # boot long before any registration
    reg.register("adopt-v2", dirs[0])
    assert reloader.check_once() is True  # rebuilt + swapped, not adopted
    assert built == [dirs[0]]
    # and the swap ADOPTED adopt-v2's key: the next poll is a no-op, not a
    # rebuild-every-tick loop
    assert reloader.current_key[0] is not None
    assert reloader.check_once() is False
    assert built == [dirs[0]]


# ---------------------------------------------------------------------------
# Data hot reload (serve --data-poll-s): refreshed review/friendship CSVs
# reach live traffic without a restart. The reference reads the CSVs once in
# its startup lifespan (main.py:242-245) — new data requires a restart.
# ---------------------------------------------------------------------------

import os

from hhrs_tpu.data.synthetic import append_reviews, write_synthetic_dataset
from hhrs_tpu.serve.reload import DataReloader, data_fingerprint


@pytest.fixture(scope="module")
def data_reload_setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("data_reload")
    data_dir = str(tmp / "data")
    ds = write_synthetic_dataset(
        data_dir, n_users=120, n_items=60, n_reviews=2500, seed=45)
    main_df = add_engineered_features(
        ds.reviews.rename(columns={"guest_id": "user_id", "hotel_id": "item_id"})
    )
    splits, art = Preprocessor().fit_transform(noise_filter(main_df.copy()))
    dims = ModelDims.from_artifacts(art)
    mcfg = ModelConfig(emb_dim=8, hidden_dim=32, n_cross_layers=1, n_res_blocks=1)
    r = train_dcn(splits, dims, mcfg,
                  TrainConfig(lr=3e-3, batch_size=256, n_epochs=1, seed=7))
    art_dir = str(tmp / "artifacts")
    export_artifacts(art_dir, r.params, r.bn_state, mcfg, dims, art,
                     r.final_metrics)

    def build(adir):
        # the production build_stack shape: re-reads the data dir's CSVs
        return RecommendationEngine.from_dirs(adir, data_dir)

    return data_dir, art_dir, build


# the shared refreshed-data-drop simulator (hhrs_tpu/data/synthetic.py)
_append_review = append_reviews


def test_data_reload_swaps_on_stable_change(data_reload_setup):
    data_dir, art_dir, build = data_reload_setup
    holder = SwappableEngine(build(art_dir))
    dr = DataReloader(holder, data_dir, build, poll_s=3600,
                      current_dir_fn=lambda: art_dir)
    first = holder.current

    # unchanged data → no swap, ever
    assert dr.check_once() is False
    assert holder.current is first

    new_user = 10_987_654
    assert new_user not in set(int(u) for u in holder.gen.universe.user_ids)
    _append_review(data_dir, new_user)
    # tick 1: fingerprint changed but not yet stable → debounce, no swap
    assert dr.check_once() is False
    assert holder.current is first
    # tick 2: stable → rebuild + swap
    assert dr.check_once() is True
    assert holder.current is not first
    assert new_user in set(int(u) for u in holder.gen.universe.user_ids)
    # the new universe serves traffic
    res = holder.recommend(new_user, holder.gen.universe.cities[0],
                           "personal", 1.0)
    assert "ranked_hotels" in res
    # steady state: no further swaps
    assert dr.check_once() is False


def test_data_reload_debounces_mid_write_churn(data_reload_setup):
    """A file still being appended (fingerprint moves every tick) must keep
    deferring the rebuild — only a STABLE fingerprint swaps."""
    data_dir, art_dir, build = data_reload_setup
    builds = []

    def counting_build(adir):
        builds.append(adir)
        return build(adir)

    holder = SwappableEngine(build(art_dir))
    dr = DataReloader(holder, data_dir, counting_build, poll_s=3600,
                      current_dir_fn=lambda: art_dir)
    for uid in (20_000_001, 20_000_002, 20_000_003):
        _append_review(data_dir, uid)
        assert dr.check_once() is False  # fp moved again since last tick
    assert builds == []  # never rebuilt during the churn
    assert dr.check_once() is True  # stable now → one swap
    assert builds == [art_dir]


def test_data_reload_failed_parse_keeps_serving(data_reload_setup):
    """A torn/corrupt data drop must keep the current universe serving
    (and back off); a subsequent good drop recovers immediately."""
    data_dir, art_dir, build = data_reload_setup
    holder = SwappableEngine(build(art_dir))
    dr = DataReloader(holder, data_dir, build, poll_s=3600,
                      current_dir_fn=lambda: art_dir)
    first = holder.current
    p = os.path.join(data_dir, "hackathon_augmented_data.csv")
    good = open(p, "rb").read()
    with open(p, "wb") as f:
        f.write(b"guest_id,hotel_id\n1,2\n")  # missing required columns
    assert dr.check_once() is False  # debounce tick
    assert dr.check_once() is False  # rebuild attempted, parse FAILED
    assert holder.current is first   # still serving the old universe
    uni = holder.gen.universe
    assert "ranked_hotels" in holder.recommend(
        int(uni.user_ids[0]), uni.cities[0], "friends", 1.0)
    # the failed fingerprint is remembered: no rebuild storm
    assert dr._failed_fp is not None

    with open(p, "wb") as f:
        f.write(good)
    _append_review(data_dir, 30_000_001)
    assert dr.check_once() is False  # new fingerprint → debounce
    assert dr.check_once() is True   # and it swaps despite the backoff
    assert holder.current is not first


def test_data_reload_discards_engine_on_mid_build_change(data_reload_setup):
    """If the files move AGAIN while the rebuild runs, the freshly built
    engine may hold a torn read — it must be discarded un-swapped."""
    data_dir, art_dir, build = data_reload_setup
    uid = iter(range(40_000_001, 40_000_010))

    def racing_build(adir):
        eng = build(adir)
        _append_review(data_dir, next(uid))  # writer races the rebuild
        return eng

    holder = SwappableEngine(build(art_dir))
    dr = DataReloader(holder, data_dir, racing_build, poll_s=3600,
                      current_dir_fn=lambda: art_dir)
    first = holder.current
    _append_review(data_dir, next(uid))
    assert dr.check_once() is False  # debounce
    assert dr.check_once() is False  # built, then detected the race → discard
    assert holder.current is first
    # the racing write re-entered debounce; a quiet tick later it lands
    # (racing_build appends again, so this sequence converges only because
    # the post-build recheck keeps refusing torn reads)
    assert dr._pending == data_fingerprint(data_dir)


def test_data_reload_fingerprint_covers_missing_file(data_reload_setup):
    data_dir, _, _ = data_reload_setup
    fp = data_fingerprint(data_dir)
    assert all(sz is not None for (_, _, sz, _) in fp)
    missing = data_fingerprint(os.path.join(data_dir, "nope"))
    assert all(sz is None for (_, _, sz, _) in missing)
    assert fp != missing


def test_data_reload_snapshot_survives_concurrent_writes(data_reload_setup):
    """With frames_loader (the production CLI path) the rebuild parses an
    immutable SNAPSHOT of the CSVs, so a writer landing mid-rebuild no
    longer discards the work. Without it, sustained churn with an
    inter-write gap shorter than the rebuild starves reloads entirely —
    measured: a 90s soak with appends every ~12s completed ZERO reloads
    (benchmarks/serve_soak.py --data-swap-every)."""
    data_dir, art_dir, build = data_reload_setup
    from hhrs_tpu.data.ingest import load_friendships_csv, load_reviews_csv

    def frames_loader(d):
        df = add_engineered_features(load_reviews_csv(
            os.path.join(d, "hackathon_augmented_data.csv")))
        return df, load_friendships_csv(os.path.join(d, "friendships.csv"))

    calls = []

    def build2(adir, frames):
        calls.append(adir)
        # writer races EVERY rebuild — the starvation scenario
        _append_review(data_dir, 50_000_000 + len(calls))
        return RecommendationEngine(load_artifact_bundle(adir),
                                    frames[0], frames[1])

    holder = SwappableEngine(build(art_dir))
    dr = DataReloader(holder, data_dir, build2, poll_s=3600,
                      current_dir_fn=lambda: art_dir,
                      frames_loader=frames_loader)
    first = holder.current
    _append_review(data_dir, 50_999_999)
    assert dr.check_once() is False  # debounce
    assert dr.check_once() is True   # snapshot build + swap DESPITE the race
    assert holder.current is not first
    users = set(int(u) for u in holder.gen.universe.user_ids)
    assert 50_999_999 in users       # the snapshot's content is served
    assert 50_000_001 not in users   # the racing write is not in THIS swap
    # ...and the racing write triggers the NEXT cycle instead of being lost
    assert dr.check_once() is False  # debounce of the racing write
    assert dr.check_once() is True
    assert 50_000_001 in set(int(u) for u in holder.gen.universe.user_ids)
    assert calls == [art_dir, art_dir]


def test_registry_reload_parses_snapshot_despite_racing_writer(data_reload_setup):
    """A MODEL hot swap re-reads the data CSVs; with data_dir+frames_loader
    (the production CLI path) it parses a consistent snapshot, so a writer
    racing the rebuild cannot tear it (r4 review finding — the model path
    previously read the live files with no defense)."""
    data_dir, art_dir, build = data_reload_setup
    from hhrs_tpu.data.ingest import load_friendships_csv, load_reviews_csv

    seen_dirs = []

    def frames_loader(d):
        seen_dirs.append(d)
        df = add_engineered_features(load_reviews_csv(
            os.path.join(d, "hackathon_augmented_data.csv")))
        return df, load_friendships_csv(os.path.join(d, "friendships.csv"))

    def build2(adir, frames=None):
        assert frames is not None  # the snapshot path was taken
        _append_review(data_dir, 60_000_001)  # writer races the rebuild
        return RecommendationEngine(load_artifact_bundle(adir),
                                    frames[0], frames[1])

    db = os.path.join(os.path.dirname(art_dir), "reg_snap.sqlite")
    conn = connect(db)
    create_schema(conn)
    conn.close()
    reg = ModelRegistry(db)
    reg.register("v1", art_dir, activate=True)

    holder = SwappableEngine(build(art_dir))
    reloader = RegistryReloader(holder, f"registry:{db}", build2,
                                poll_s=3600, current_dir=art_dir,
                                data_dir=data_dir,
                                frames_loader=frames_loader)
    reg.register("v2", art_dir, activate=True)  # same dir, new registration
    assert reloader.check_once() is True
    # the loader parsed a TEMP SNAPSHOT, not the live dir
    assert seen_dirs and seen_dirs[0] != data_dir


def test_data_reloader_honors_pre_parse_baseline_fingerprint(data_reload_setup):
    """baseline_fp: a write landing between the caller's fingerprint and
    the reloader's construction (i.e. during the long startup parse) must
    be DETECTED, not baked into the baseline unserved (r4 review)."""
    data_dir, art_dir, build = data_reload_setup
    fp_before_parse = data_fingerprint(data_dir)
    # ...startup parse happens here; a write lands mid-startup:
    _append_review(data_dir, 61_000_001)
    holder = SwappableEngine(build(art_dir))
    dr = DataReloader(holder, data_dir, build, poll_s=3600,
                      current_dir_fn=lambda: art_dir,
                      baseline_fp=fp_before_parse)
    assert dr.check_once() is False  # change detected → debounce
    assert dr.check_once() is True   # → served
    assert 61_000_001 in set(int(u) for u in holder.gen.universe.user_ids)
    # whereas WITHOUT the baseline the same write would be invisible:
    _append_review(data_dir, 61_000_002)
    dr2 = DataReloader(holder, data_dir, build, poll_s=3600,
                      current_dir_fn=lambda: art_dir)
    assert dr2.check_once() is False
    assert dr2.check_once() is False  # stat-at-construction baked it in


def test_registry_reload_reuses_cached_frames_when_data_unchanged(data_reload_setup):
    """r4 review: a model-only promotion must NOT re-pay the snapshot+parse
    while holding the swap lock when the data fingerprint hasn't moved —
    the shared FramesCache supplies the last-parsed frames."""
    from hhrs_tpu.data.ingest import load_friendships_csv, load_reviews_csv
    from hhrs_tpu.serve.reload import FramesCache

    data_dir, art_dir, build = data_reload_setup
    parses = []

    def frames_loader(d):
        parses.append(d)
        df = add_engineered_features(load_reviews_csv(
            os.path.join(d, "hackathon_augmented_data.csv")))
        return df, load_friendships_csv(os.path.join(d, "friendships.csv"))

    # seed the cache exactly as the CLI does: fingerprint BEFORE the parse
    fp0 = data_fingerprint(data_dir)
    cache = FramesCache(fp0, frames_loader(data_dir))
    assert parses == [data_dir]

    def build2(adir, frames=None):
        assert frames is not None
        return RecommendationEngine(load_artifact_bundle(adir),
                                    frames[0], frames[1])

    db = os.path.join(os.path.dirname(art_dir), "reg_cache.sqlite")
    conn = connect(db)
    create_schema(conn)
    conn.close()
    reg = ModelRegistry(db)
    reg.register("v1", art_dir, activate=True)
    holder = SwappableEngine(build(art_dir))
    reloader = RegistryReloader(holder, f"registry:{db}", build2,
                                poll_s=3600, current_dir=art_dir,
                                data_dir=data_dir,
                                frames_loader=frames_loader,
                                frames_cache=cache)

    reg.register("v2", art_dir, activate=True)   # model-only promotion
    assert reloader.check_once() is True
    assert parses == [data_dir]                  # cache HIT: no re-parse

    _append_review(data_dir, 70_000_001)         # now the data moves
    reg.register("v3", art_dir, activate=True)
    assert reloader.check_once() is True
    assert len(parses) == 2                      # miss → snapshot parse
    assert parses[1] != data_dir                 # ...from a temp snapshot


def test_data_fingerprint_detects_same_size_inplace_rewrite(tmp_path):
    """ADVICE r4: a same-size in-place rewrite with a preserved mtime (1s
    granularity on some network mounts) must still register as a change —
    the fingerprint carries a head/tail content crc, not just stat."""
    d = str(tmp_path)
    path = os.path.join(d, "hackathon_augmented_data.csv")
    with open(path, "w") as f:
        f.write("a,b\n1,2\n")
    with open(os.path.join(d, "friendships.csv"), "w") as f:
        f.write("user_id_1,user_id_2\n")
    st = os.stat(path)
    fp1 = data_fingerprint(d)
    with open(path, "w") as f:
        f.write("a,b\n9,8\n")  # same byte length, different content
    os.utime(path, ns=(st.st_atime_ns, st.st_mtime_ns))  # coarse-mtime mount
    st2 = os.stat(path)
    assert (st2.st_size, st2.st_mtime_ns) == (st.st_size, st.st_mtime_ns)
    fp2 = data_fingerprint(d)
    assert fp1 != fp2


def test_data_reloader_reuses_cached_frames(data_reload_setup):
    """ADVICE r4: a data tick whose fingerprint was already parsed (e.g.
    by a concurrent model swap) must reuse the cached frames instead of
    re-paying the snapshot+parse — but still rebuild+swap the stack."""
    from hhrs_tpu.data.ingest import load_friendships_csv, load_reviews_csv
    from hhrs_tpu.serve.reload import FramesCache

    data_dir, art_dir, build = data_reload_setup
    parses = []

    def frames_loader(d):
        parses.append(d)
        df = add_engineered_features(load_reviews_csv(
            os.path.join(d, "hackathon_augmented_data.csv")))
        return df, load_friendships_csv(os.path.join(d, "friendships.csv"))

    def build2(adir, frames=None):
        assert frames is not None
        return RecommendationEngine(load_artifact_bundle(adir),
                                    frames[0], frames[1])

    fp0 = data_fingerprint(data_dir)
    cache = FramesCache()
    holder = SwappableEngine(build(art_dir))
    dr = DataReloader(holder, data_dir, build2, poll_s=3600,
                      current_dir_fn=lambda: art_dir,
                      frames_loader=frames_loader, baseline_fp=fp0,
                      frames_cache=cache)
    first = holder.current

    _append_review(data_dir, 71_000_001)
    # someone else (a model swap) already parsed the NEW fingerprint:
    cache.put(data_fingerprint(data_dir), frames_loader(data_dir))
    assert len(parses) == 1

    assert dr.check_once() is False   # debounce tick
    assert dr.check_once() is True    # swap — from the cache
    assert holder.current is not first
    assert len(parses) == 1           # NO second parse, no snapshot
    assert 71_000_001 in set(int(u) for u in holder.gen.universe.user_ids)


def test_registry_swap_advances_data_reloader_baseline(data_reload_setup):
    """ADVICE r4: when a model promotion parses a FRESH data fingerprint,
    the data reloader's baseline advances with the swap — its next tick
    must not rebuild an equivalent stack (redundant swap inflation)."""
    from hhrs_tpu.data.ingest import load_friendships_csv, load_reviews_csv
    from hhrs_tpu.serve.reload import FramesCache

    data_dir, art_dir, build = data_reload_setup

    def frames_loader(d):
        df = add_engineered_features(load_reviews_csv(
            os.path.join(d, "hackathon_augmented_data.csv")))
        return df, load_friendships_csv(os.path.join(d, "friendships.csv"))

    builds = []

    def build2(adir, frames=None):
        builds.append(adir)
        assert frames is not None
        return RecommendationEngine(load_artifact_bundle(adir),
                                    frames[0], frames[1])

    db = os.path.join(os.path.dirname(art_dir), "reg_advance.sqlite")
    conn = connect(db)
    create_schema(conn)
    conn.close()
    reg = ModelRegistry(db)
    reg.register("v1", art_dir, activate=True)

    fp0 = data_fingerprint(data_dir)
    cache = FramesCache(fp0, frames_loader(data_dir))
    holder = SwappableEngine(build(art_dir))
    import threading
    lock = threading.Lock()
    reloader = RegistryReloader(holder, f"registry:{db}", build2,
                                poll_s=3600, current_dir=art_dir,
                                swap_lock=lock, data_dir=data_dir,
                                frames_loader=frames_loader,
                                frames_cache=cache)
    dr = DataReloader(holder, data_dir, build2, poll_s=3600,
                      current_dir_fn=lambda: reloader.current_dir,
                      swap_lock=lock, frames_loader=frames_loader,
                      baseline_fp=fp0, frames_cache=cache)
    reloader.data_reloader = dr

    # data moves, and THEN a promotion lands before the data poller ticks:
    _append_review(data_dir, 72_000_001)
    reg.register("v2", art_dir, activate=True)
    assert reloader.check_once() is True      # parsed the fresh snapshot
    assert len(builds) == 1
    served = holder.current

    # the data poller's next ticks see an already-served universe: no-op
    assert dr.check_once() is False
    assert dr.check_once() is False
    assert dr.check_once() is False
    assert holder.current is served
    assert len(builds) == 1
    assert 72_000_001 in set(int(u) for u in holder.gen.universe.user_ids)


def test_append_reviews_handles_missing_trailing_newline(tmp_path):
    """ADVICE r4: appending to a hand-edited CSV without a trailing
    newline must not concatenate the first cloned row onto the last line."""
    d = str(tmp_path / "nl")
    write_synthetic_dataset(d, n_users=20, n_items=10, n_reviews=50, seed=3)
    path = os.path.join(d, "hackathon_augmented_data.csv")
    with open(path) as f:
        content = f.read()
    assert content.endswith("\n")
    with open(path, "w") as f:
        f.write(content[:-1])  # strip the trailing newline (hand edit)
    with open(path) as f:
        n_before = sum(1 for _ in f)
    append_reviews(d, 73_000_001, n=2)
    import pandas as pd
    df = pd.read_csv(path)
    assert len(df) == n_before - 1 + 2  # header excluded; no merged rows
    assert (df["guest_id"] == 73_000_001).sum() == 2
