"""Hot model reload from the registry (serve `--reload-poll-s`).

The reference designs an `ml_models` registry with an `is_active` flag
(database_setup.py:54-64, Documentation.md:256-271) but its serving code
never reads it — models change only by restarting the process. Here the
registry is live at startup (`--artifacts registry:<db>`) AND during
serving: a poller thread watches the active registration and swaps in the
newly activated model without dropping traffic.

Swap semantics: `SwappableEngine` is one attribute indirection. A request
thread that already grabbed the old engine finishes on it; every later
request sees the new one (attribute assignment is atomic under the GIL —
no locking on the hot path). The old engine's device buffers free when
the last in-flight request drops its reference. A failed load (missing
dir, corrupt artifacts) logs and keeps serving the current model — the
startup fail-fast contract (reference main.py:274-277) applies only at
startup; a running server never kills itself over a bad swap.
"""

from __future__ import annotations

import logging
import threading

from hhrs_tpu.db.registry import ModelRegistry

log = logging.getLogger("hhrs_tpu.serve.reload")

# Seconds to keep the PREVIOUS engine stack alive after a swap before
# closing it: a request that grabbed the old engine just before the swap
# (or sat in the old dynamic batcher's queue) must finish on it, not get a
# "closed" error. Far beyond any request latency + batch window.
OLD_STACK_CLOSE_GRACE_S = 10.0

# Backoff after a FAILED load of a registration: a full engine build is
# seconds-to-minutes of CSV parsing + device transfers + warmup, so a
# persistently broken artifact dir must not be re-attempted every poll
# tick. A registration key change (operator fixed and re-registered)
# retries immediately; the same broken key retries after this long.
FAILED_LOAD_RETRY_S = 60.0


class SwappableEngine:
    """Forwarding proxy so the HTTP layer (and dynamic batcher) can keep a
    stable object while the engine underneath is hot-swapped."""

    def __init__(self, engine):
        self._engine = engine

    def swap(self, new_engine):
        """Atomically install ``new_engine``; returns the previous one."""
        old, self._engine = self._engine, new_engine
        return old

    @property
    def current(self):
        return self._engine

    def __getattr__(self, name):
        # Only reached for names not defined on the proxy itself.
        return getattr(self._engine, name)


class RegistryReloader(threading.Thread):
    """Polls `registry:<db>` for a change of the active model's artifact
    dir; on change, builds a fresh engine stack and swaps it in.

    ``build`` is a callable(artifacts_dir) -> engine so the CLI decides
    the full stack (mesh / bf16 / quantized tables / warmup) once and
    reloads reproduce it. ``check_once`` is the unit-testable core; the
    thread is just check_once on a timer.
    """

    def __init__(self, holder: SwappableEngine, spec: str, build,
                 poll_s: float, current_dir: str):
        super().__init__(daemon=True, name="hhrs-registry-reloader")
        self.holder = holder
        self.spec = spec
        self.build = build
        self.poll_s = poll_s
        self._stop = threading.Event()
        # The swap key is (model_id, artifact_path), not the path alone: a
        # retrain exported over the SAME directory and re-registered is a
        # new model and must swap (a new snapshot gets a new model_id).
        self.current_key = (None, current_dir)
        self._failed_key = None
        self._failed_at = 0.0
        import time as _time

        # wall clock, same base as the registry's created_at column — lets
        # the adopt branch below tell a pre-boot registration (the one the
        # server loaded) from a post-boot re-registration over the same dir
        self._boot_at = _time.time()
        try:
            active, _created = self._active()
            if active[1] == current_dir:
                self.current_key = active
        except Exception:  # registry unreadable at init → first poll decides
            pass

    @property
    def current_dir(self) -> str:
        return self.current_key[1]

    def _active(self) -> tuple:
        """((model_id, artifact_path), created_at) of the active registration."""
        reg = ModelRegistry(self.spec[len("registry:"):])
        active = reg.active()
        if active is None:
            raise FileNotFoundError("no active model in registry")
        return ((active["model_id"], active["artifact_path"]),
                float(active.get("created_at") or 0.0))

    def check_once(self) -> bool:
        """One poll: swap if the active registration moved. Returns True
        iff a new model was installed. Never raises — a failed resolve or
        load keeps the current model serving."""
        import time

        try:
            new_key, created_at = self._active()
        except Exception as e:
            log.warning("registry poll failed (%s); keeping current model", e)
            return False
        if new_key == self.current_key:
            return False
        if (self.current_key[0] is None and new_key[1] == self.current_dir
                and created_at <= self._boot_at):
            # Init couldn't read the registry (transient lock) but the
            # active registration PREDATES boot and points at the dir
            # ALREADY serving — it is the registration the server loaded;
            # adopt its key instead of rebuilding the identical stack. A
            # registration CREATED AFTER boot over the same dir is a new
            # snapshot (new weights on disk) and falls through to a real
            # rebuild+swap below.
            self.current_key = new_key
            return False
        if new_key == self._failed_key and (
            time.monotonic() - self._failed_at < FAILED_LOAD_RETRY_S
        ):
            return False  # same broken registration: back off, retry later
        new_dir = new_key[1]
        log.info("registry: active model changed %s -> %s (model_id %s); loading...",
                 self.current_dir, new_dir, new_key[0])
        try:
            new_engine = self.build(new_dir)
        except Exception as e:
            log.error("hot reload of %s FAILED (%s); keeping %s (retry in %.0fs "
                      "unless the registration changes)",
                      new_dir, e, self.current_dir, FAILED_LOAD_RETRY_S)
            self._failed_key = new_key
            self._failed_at = time.monotonic()
            return False
        self._failed_key = None
        old = self.holder.swap(new_engine)
        self.current_key = new_key

        def _close_old():
            close = getattr(old, "close", None)
            if callable(close):
                try:
                    close()
                except Exception:  # old stack teardown must never hurt serving
                    log.exception("closing the previous engine failed")

        # Deferred: requests that grabbed the old stack right before the
        # swap (or sat in its batcher queue) finish on it error-free.
        t = threading.Timer(OLD_STACK_CLOSE_GRACE_S, _close_old)
        t.daemon = True
        t.start()
        log.info("hot reload complete: serving %s", new_dir)
        return True

    def run(self):
        while not self._stop.wait(self.poll_s):
            self.check_once()

    def stop(self):
        self._stop.set()
