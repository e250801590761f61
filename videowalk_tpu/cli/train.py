"""Training driver (reference ``code/train.py`` parity).

Structure mirrors the reference main (code/train.py:133-302): dataset +
metadata cache -> RandomClipSampler -> loader -> CRW/CRWTeacherStudent ->
Adam + per-step MultiStepLR -> epoch loop with per-step Bernoulli
patch-vs-superpixel choice (:54-66), stochastic checkpointing p=0.005 (:76),
meters ('clips/s', loss, lr), resume / partial reload, per-epoch checkpoints.

TPU-native differences:
- the two node paths are two jit-compiled step functions; the Bernoulli draw
  stays on the host (exactly like the reference's python-level branch);
- superpixels run on device by default (--sp-backend device): the batched
  SLIC consumes the unnormalized view directly on TPU, replacing the
  reference's CPU-worker segmentation (its known bottleneck);
- --data-parallel shards the batch over all local devices via a Mesh
  (replacing torch DataParallel, code/train.py:260-262).
"""

from __future__ import annotations

import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from videowalk_tpu.data import DataLoader, Kinetics400, RandomClipSampler, VideoList
from videowalk_tpu.data.augs import get_train_transforms
from videowalk_tpu.data.clips import VideoClipIndex
from videowalk_tpu.models import CRW, CRWConfig, CRWTeacherStudent
from videowalk_tpu.parallel import (create_train_state, make_mesh,
                                    make_optimizer, make_train_step,
                                    multistep_lr, replicate, shard_batch)
from videowalk_tpu.utils import (MetricLogger, SmoothedValue, load_checkpoint,
                                 partial_load, save_checkpoint)

# --steps-per-epoch's "unlimited" default (utils/arguments.py): at or above
# this the flag was not set by the caller and the shortfall guard is off.
_STEPS_UNLIMITED = int(1e10)


def model_config(args) -> CRWConfig:
    return CRWConfig(
        model_type=args.model_type,
        pretrained_path=getattr(args, "pretrained_path", ""),
        remove_layers=tuple(args.remove_layers),
        head_depth=args.head_depth,
        temperature=args.temp,
        edgedrop_rate=args.dropout,
        featdrop_rate=args.featdrop,
        flip=args.flip,
        sk_targets=args.sk_targets,
        zero_diagonal=args.zero_diagonal,
        head_bias=args.teacher_student,
        use_zero_softmax=not args.teacher_student,
        max_sp_num=args.max_sp_num,
        dilate_superpixels=args.dilate_superpixels,
        dilation_kernel_shape=args.dilation_kernel_shape,
        dilation_kernel_size=args.dilation_kernel_size,
        dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32,
        remat=getattr(args, "remat", False),
        # None (flag absent) defers to VIDEOWALK_REMAT_STAGES at trace time;
        # an explicit "" / "all" pins every stage, overriding the env
        # (CRWConfig docstring contract).
        remat_stages=getattr(args, "remat_stages", None),
    )


def make_dataset(args, transform):
    """Kinetics tree, or frame-folder filelist (reference train.py:159-189)."""
    traindir = os.path.join(
        args.data_path, "train_256" if not args.fast_test else "val_256")
    # Directory routing (reference train.py:161-189): kinetics-style video
    # trees -> Kinetics400; image datasets -> ImageFolder (the reference's
    # HACK branch, code/train.py:179-180 — made functional here: each image
    # becomes a clip_len static clip of independently augmented views, see
    # data/image_folder.py); a non-directory path is a VideoList filelist.
    root_dir = traindir if os.path.isdir(traindir) else args.data_path
    if "kinetics" not in args.data_path.lower():
        from videowalk_tpu.data.image_folder import ImageFolder, is_image_folder

        if is_image_folder(root_dir):
            ds = ImageFolder(
                root_dir, clip_len=args.clip_len, transform=transform,
                sp_method=args.sp_method, num_components=args.num_sp,
                prob=args.prob,
                randomise_superpixels=args.randomise_superpixels,
                randomise_superpixels_range=args.randomise_superpixels_range,
                sp_backend=args.sp_backend, seed=args.seed)
            return ds
    if ("kinetics" in args.data_path.lower() or os.path.isdir(traindir)
            or os.path.isdir(args.data_path)):
        cached = None
        if args.cache_dataset and os.path.exists(args.cache_path):
            print(f"Loading dataset metadata from {args.cache_path}")
            cached = VideoClipIndex.load_metadata(args.cache_path)
        root = traindir if os.path.isdir(traindir) else args.data_path
        ds = Kinetics400(
            root,
            frames_per_clip=args.clip_len,
            step_between_clips=1,
            frame_rate=args.frame_skip,
            transform=transform,
            _precomputed_metadata=cached,
            sp_method=args.sp_method,
            num_components=args.num_sp,
            prob=args.prob,
            randomise_superpixels=args.randomise_superpixels,
            randomise_superpixels_range=args.randomise_superpixels_range,
            sp_backend=args.sp_backend,
            seed=args.seed,
        )
        if (cached is None and args.cache_path
                and jax.process_index() == 0):
            # rank-gated: on a shared filesystem every process would write
            # the same file concurrently (torn cache); non-primary ranks
            # simply keep the metadata they just computed in memory
            os.makedirs(os.path.dirname(args.cache_path) or ".", exist_ok=True)
            ds.video_clips.save_metadata(args.cache_path)
            print(f"Saved dataset metadata to {args.cache_path}")
        return ds
    return VideoList(filelist=args.data_path, clip_len=args.clip_len,
                     is_train=True, frame_gap=args.frame_skip,
                     transform=transform, random_clip=True, seed=args.seed)


def resolve_remat_args(args) -> None:
    """--remat-stages startup semantics (mutates args in place).

    An explicit stage list is validated eagerly (a typo'd list must fail at
    startup even when resnet.py's remat gate would never read it) and warned
    about when inert (--remat off). Bare --remat gets the MEASURED default
    'layer1' (batch-32 remat ladder, v5e 2026-08-19, STATUS round-4 item 1:
    layer1-only runs 543.5 ms/step vs full remat's 636.6 and even beats
    remat-off's 552.2 — recomputing the cheap-FLOPs/large-bytes 16x16x64
    stage is cheaper than storing it, while layer3/4 recompute is pure
    loss); --remat-stages all is the full-remat escape hatch for
    memory-constrained scales the ladder did not cover. An explicit
    VIDEOWALK_REMAT_STAGES env keeps its documented trace-time precedence
    (remat_stages stays None and defers)."""
    if getattr(args, "remat_stages", None) is not None:
        from videowalk_tpu.models.resnet import _remat_stage_set

        _remat_stage_set(args.remat_stages)
        if not getattr(args, "remat", False):
            print("WARNING: --remat-stages is inert without --remat "
                  "(selective remat only chooses WHICH stages remat)",
                  flush=True)
    elif getattr(args, "remat", False):
        if "VIDEOWALK_REMAT_STAGES" not in os.environ:
            args.remat_stages = "layer1"
            print("NOTE: --remat without --remat-stages uses the measured "
                  "default 'layer1' (batch-32 ladder: 543.5 ms/step vs full "
                  "remat's 636.6 on v5e). Pass --remat-stages all for full "
                  "remat if activations do not fit.", flush=True)


def check_step_shortfall(args, epoch: int, delivered: int) -> None:
    """Silent step-shortfall guard (the bug class behind the 2026-08-19
    rehearsal pilots: "--train-steps 1200" silently trained 200 steps
    because the loader held ~5 batches/epoch, not the requested 30; the
    reference's own epoch loop, code/train.py:294-298, has the same silent
    behavior). An explicit --steps-per-epoch is a step BUDGET the caller
    sized total training around, so falling short must be loud: WARN by
    default, raise under --strict-steps."""
    if not (args.steps_per_epoch < _STEPS_UNLIMITED
            and delivered < args.steps_per_epoch):
        return
    msg = (f"epoch {epoch} delivered {delivered} batches but "
           f"--steps-per-epoch requested {args.steps_per_epoch}: the "
           f"loader is shorter than the request, so total trained steps "
           f"fall short by the same ratio. Size --epochs from the real "
           f"epoch length (printed at loader creation), or add data / "
           f"raise --clips-per-video.")
    if getattr(args, "strict_steps", False):
        raise RuntimeError(msg)
    print("WARNING: " + msg, flush=True)


def train_one_epoch(args, models, steps, state, data_loader, epoch, mesh,
                    rng, checkpoint_fn, device_slic_fn, vis=None):
    metric_logger = MetricLogger(delimiter="  ")
    metric_logger.add_meter("lr", SmoothedValue(window_size=1, fmt="{value}"))
    metric_logger.add_meter("clips/s",
                            SmoothedValue(window_size=10, fmt="{value:.3f}"))
    header = f"Epoch: [{epoch}]"
    host_rng = np.random.RandomState(args.seed + epoch)
    # Host-side mirror of state.step: reading int(state.step) or
    # float(metrics["loss"]) forces a device fetch (a full pipeline sync
    # through the tunnel) — done once per epoch here, then tracked in Python.
    # Metrics are fetched only every --print-freq steps (the reference's own
    # logging cadence, code/train.py:41-43), so between fetches the steps
    # dispatch asynchronously and pipeline on device.
    global_step = int(state.step)
    fetch_every = max(1, args.print_freq)
    window_clips, window_t0 = 0, time.time()
    # clips/s reports GLOBAL throughput: each process steps the same global
    # batch in lockstep, contributing local_batch clips of it
    world = jax.process_count()

    if vis is not None:  # wandb/JSONL init (reference train.py:48-49)
        vis.wandb_init(models)

    profile_dir = getattr(args, "profile_dir", "")
    profiling = False

    device_augs = getattr(args, "augs_backend", "host") == "device"
    # independent key streams: folding both by global_step from ONE key with
    # a constant offset (the old 7919 trick) collides once global_step
    # passes the offset — fold_in(rng, t) == fold_in(rng, 7919 + (t - 7919))
    step_rng, aug_rng = jax.random.split(rng)
    # len(data_loader) once, not per step: the sampler-backed length is an
    # O(videos) sum, and per-step calls would also tempt a sampler draw
    total_steps = min(args.steps_per_epoch, len(data_loader))

    delivered = 0
    try:
        # total=total_steps: with --steps-per-epoch below the loader length
        # the ETA and the [i/total] counter must count to the real stop
        # point, not the full loader (otherwise ETA inflates by the ratio)
        for step_i, (views, sp_mask, _label) in enumerate(
                metric_logger.log_every(data_loader, args.print_freq, header,
                                        total=total_steps)):
            if step_i >= args.steps_per_epoch:
                break
            delivered += 1
            if device_augs:
                # batched on-TPU 3-view transform (ops/augs_device.py) replaces
                # the host augmentation pipeline entirely
                from videowalk_tpu.ops.augs_device import train_transform_device

                views = train_transform_device(
                    jax.random.fold_in(aug_rng, global_step),
                    jnp.asarray(views["raw"]),
                    img_size=args.img_size,
                    patch_size=int(args.patch_size[0]),
                    frame_aug=args.frame_aug or "",
                    frame_transforms=args.frame_transforms)
            # jax.profiler trace of steps 5..9 (TPU analogue of the reference's
            # wall-clock + max-mem telemetry; SURVEY.md §5 tracing plan)
            if profile_dir and epoch == 0 and step_i == 5 and not profiling:
                jax.profiler.start_trace(profile_dir)
                profiling = True
            if profiling and step_i == 10:
                jax.profiler.stop_trace()
                profiling = False
            # patch vs superpixel Bernoulli (reference train.py:54)
            grid = bool(host_rng.choice([True, False],
                                        p=[args.prob, 1 - args.prob]))
            key = jax.random.fold_in(step_rng, global_step)

            if grid or args.teacher_student:
                # host arrays go straight to the mesh layout (jnp.asarray
                # first would stage on one device, and in multi-process
                # put_global would then fetch it back to host — a full
                # per-step round trip of the batch)
                batch = (shard_batch(views["grid"], mesh) if mesh is not None
                         else jnp.asarray(views["grid"]))
                state, metrics = steps["patch"](state, batch, key)
                stepped = views["grid"]
            else:
                if args.sp_backend == "device":
                    unnorm = (shard_batch(views["whole_unnorm"], mesh)
                              if mesh is not None
                              else jnp.asarray(views["whole_unnorm"]))
                    mask = device_slic_fn(unnorm, host_rng)
                else:
                    mask = sp_mask
                video = (shard_batch(views["whole"], mesh) if mesh is not None
                         else jnp.asarray(views["whole"]))
                if mesh is not None:
                    mask = shard_batch(mask, mesh)
                else:
                    mask = jnp.asarray(mask)
                state, metrics = steps["superpixel"](state, video, key, mask)
                stepped = views["whole"]

            global_step += 1
            # GLOBAL clips this step: a prefetched multi-process batch is
            # already the global array (shape[0] = global batch); a host /
            # fully-addressable one is this process's local block
            n_clips = stepped.shape[0]
            if world > 1 and getattr(stepped, "is_fully_addressable", True):
                n_clips *= world
            window_clips += n_clips

            if vis is not None:
                # per-step loss + walk diagnostics (reference train.py:71-73).
                # Opt-in: logging forces a per-step fetch, like the reference's
                # per-step wandb calls.
                vis.log(dict(loss=float(metrics["loss"])))
                vis.log({k: float(np.asarray(v).mean())
                         for k, v in metrics.items() if k != "loss"})

            last = step_i + 1 >= total_steps
            if step_i % fetch_every == 0 or last:
                loss = float(metrics["loss"])  # blocks through this step
                if not np.isfinite(loss):
                    # Always-on analogue of the reference's global anomaly mode
                    # (code/train.py:27): a NaN/Inf loss aborts at the next
                    # print-freq fetch instead of silently corrupting the run.
                    where = args.output_dir or "<no --output-dir>"
                    raise FloatingPointError(
                        f"non-finite loss {loss} at epoch {epoch} step {step_i} "
                        f"(global step {global_step}). Re-run with --debug-nans "
                        f"to locate the producing op, or lower --lr / raise "
                        f"--temp; the last checkpoint in {where} is intact.")
                lr = float(multistep_lr(args.lr, steps["milestones"],
                                        args.lr_gamma)(global_step))
                metric_logger.update(loss=loss, lr=lr)
                metric_logger.meters["clips/s"].update(
                    window_clips / max(time.time() - window_t0, 1e-9))
                window_clips, window_t0 = 0, time.time()

            # stochastic checkpointing (reference train.py:76-77)
            if checkpoint_fn is not None and host_rng.random_sample() < 0.005:
                checkpoint_fn(state, epoch)

    finally:
        if profiling:
            # flush on every exit path — epoch shorter than 10 steps, a
            # loader/step exception, or the finite-loss abort — else the
            # trace is left running and unreadable
            jax.profiler.stop_trace()
    check_step_shortfall(args, epoch, delivered)
    if checkpoint_fn is not None:
        checkpoint_fn(state, epoch)
    return state


def main(args):
    from videowalk_tpu.utils.platform import (
        enable_persistent_compile_cache, respect_jax_platforms_env)

    respect_jax_platforms_env()
    enable_persistent_compile_cache()
    # Multi-process cluster join must precede the first device query
    # (parallel/multihost.py). After this, jax.devices() is the GLOBAL list.
    from videowalk_tpu.parallel.multihost import initialize_from_args

    world = initialize_from_args(args)
    rank = jax.process_index()
    if world > 1:
        # a multi-process run is by definition data-parallel over the
        # global mesh; --batch-size stays the GLOBAL batch (reference
        # semantics: one number describes the run)
        args.data_parallel = True
        if args.batch_size % world:
            raise ValueError(
                f"--distributed needs --batch-size ({args.batch_size}) "
                f"divisible by the {world} processes")
    if getattr(args, "debug_nans", False):
        # Opt-in analogue of the reference's set_detect_anomaly(True)
        # (code/train.py:27): every primitive's output is NaN-checked and
        # the run errors at the producing op. Expensive; debugging only.
        jax.config.update("jax_debug_nans", True)
    if args.teacher_student:
        assert args.prob == 1, (
            "Teacher-Student training is not yet compatible with "
            "probabilistic sp | patch sampling")  # reference train.py:136-137

    # Inert-but-parsed flags (dead in the reference too — parsed at
    # code/utils/arguments.py:131,191 and never read): warn loudly instead
    # of silently ignoring, matching the test CLI's warn_inert_flags.
    if getattr(args, "lr_warmup_epochs", 0):
        print("WARNING: --lr-warmup-epochs is parsed but not used (the "
              "reference never implemented warmup either); the schedule is "
              "per-step MultiStepLR only", flush=True)
    if getattr(args, "sk_align", False):
        print("WARNING: --sk-align is parsed but dead (as in the "
              "reference); use --sk-targets for the Sinkhorn-Knopp target "
              "path", flush=True)
    resolve_remat_args(args)

    print("Arguments", end="\n" + "-" * 100 + "\n")
    for arg, value in vars(args).items():
        print(f"{arg} = {value}")
    print("-" * 100)
    print("jax devices:", jax.devices())

    print("Preparing training dataloader", end="\n" + "-" * 100 + "\n")
    st = time.time()
    if getattr(args, "augs_backend", "host") == "device":
        from videowalk_tpu.data.augs import RawClipTransform

        transform_train = RawClipTransform(args.img_size)
    else:
        transform_train = get_train_transforms(args)
    dataset = make_dataset(args, transform_train)
    if hasattr(dataset, "set_compactness"):
        print("Set Compactness at:", args.compactness)
        dataset.set_compactness(args.compactness)
    print("Took", time.time() - st)

    print("Creating data loaders", end="\n" + "-" * 100 + "\n")
    if hasattr(dataset, "video_clips"):
        sampler = RandomClipSampler(dataset.video_clips,
                                    args.clips_per_video, seed=args.seed)
    else:
        sampler = None
    # Multi-process: each process loads its disjoint sampler shard of
    # global_batch/world clips per step (parallel/multihost.py contract).
    data_loader = DataLoader(dataset, batch_size=args.batch_size // world,
                             sampler=sampler,
                             num_workers=max(1, args.workers // 2),
                             shard=(rank, world) if world > 1 else None)
    # Loud, parseable epoch length: callers sizing --epochs around a step
    # budget need the REAL batches/epoch (see the shortfall guard in
    # train_one_epoch; sampler caps like clips-per-video > available clips
    # make the naive vids*cpv/batch estimate silently wrong).
    print(f"Epoch length: {len(data_loader)} batches", flush=True)

    # Model
    print("Creating model", end="\n" + "-" * 100 + "\n")
    cfg = model_config(args)
    if args.teacher_student:
        model = CRWTeacherStudent(cfg, alpha=args.alpha_teacher_student)
        frozen = ("teacher_encoder", "teacher_head")
    else:
        model = CRW(cfg)
        frozen = ()

    steps_per_epoch = len(data_loader)
    milestones = [steps_per_epoch * m for m in args.lr_milestones]
    optimizer = make_optimizer(args.lr, milestones, args.lr_gamma,
                               optim=args.optim, momentum=args.momentum)

    # init with one example batch
    example = dataset[next(iter(sampler)) if sampler is not None else 0]
    views0 = example[0]
    if getattr(args, "augs_backend", "host") == "device":
        from videowalk_tpu.ops.augs_device import train_transform_device

        views0 = jax.tree_util.tree_map(
            lambda x: np.asarray(x),
            train_transform_device(
                jax.random.PRNGKey(0), jnp.asarray(views0["raw"][None]),
                img_size=args.img_size, patch_size=int(args.patch_size[0]),
                frame_aug=args.frame_aug or "",
                frame_transforms=args.frame_transforms))
        views0 = {k: v[0] for k, v in views0.items()}
    rng0 = jax.random.PRNGKey(args.seed)
    if args.prob > 0 or args.teacher_student:
        state = create_train_state(
            model, optimizer, jnp.asarray(views0["grid"][None]), rng0)
    else:
        mask0 = (jnp.zeros((1, args.clip_len, args.img_size, args.img_size),
                           jnp.int32) if args.sp_backend == "device"
                 else jnp.asarray(example[1][None]))
        state = create_train_state(
            model, optimizer, jnp.asarray(views0["whole"][None]), rng0,
            sp_mask=mask0)

    # Pretrained encoder weights (reference make_encoder downloads + munges
    # these inside model construction, code/utils/__init__.py:300-351; here
    # params exist only after init, so the import happens now)
    from videowalk_tpu.utils.pretrained import (PRETRAINED_TYPES,
                                                apply_pretrained_encoder)

    if args.model_type in PRETRAINED_TYPES:
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        variables = apply_pretrained_encoder(
            variables, args.model_type,
            getattr(args, "pretrained_path", ""), verbose=False)
        state = state.replace(params=variables["params"],
                              batch_stats=variables["batch_stats"])
        print(f"Loaded pretrained {args.model_type} encoder weights from "
              f"{args.pretrained_path}")

    # Teacher weights (reference teacherstudent.py:321-328 — it loads the
    # file unconditionally and errors loudly if absent; distilling against
    # a RANDOM frozen teacher completes with plausible-looking losses, so a
    # silent skip here would produce garbage runs)
    if args.teacher_student:
        if not os.path.isfile(args.path_to_pretrained):
            raise FileNotFoundError(
                f"--teacher-student needs a pretrained teacher checkpoint; "
                f"--path-to-pretrained={args.path_to_pretrained!r} is not a "
                f"file")
        ckpt = load_checkpoint(args.path_to_pretrained)
        tstate = {("teacher." + k): v for k, v in ckpt["model"].items()}
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        variables = partial_load(tstate, variables)
        state = state.replace(params=variables["params"],
                              batch_stats=variables["batch_stats"])

    # Partial reload (reference train.py:265-268)
    if args.partial_reload:
        ckpt = load_checkpoint(args.partial_reload)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        variables = partial_load(ckpt["model"], variables)
        state = state.replace(params=variables["params"],
                              batch_stats=variables["batch_stats"])

    # Resume from a native orbax directory: lossless restore of params,
    # batch_stats, optimizer state, and step (the .pth path below restores
    # the optimizer only when the file was written by this framework).
    # Reference analogue: code/train.py:272-277 restores model+optimizer+
    # scheduler+epoch; orbax is the TPU-native superset of that.
    if args.resume and os.path.isdir(args.resume):
        from videowalk_tpu.utils.checkpoint import load_checkpoint_orbax

        template = {"params": state.params, "batch_stats": state.batch_stats,
                    "opt_state": state.opt_state, "step": int(state.step)}
        tree, meta = load_checkpoint_orbax(args.resume, item=template)
        state = state.replace(
            params=jax.tree_util.tree_map(jnp.asarray, tree["params"]),
            batch_stats=jax.tree_util.tree_map(jnp.asarray,
                                               tree["batch_stats"]),
            opt_state=jax.tree_util.tree_map(jnp.asarray, tree["opt_state"]),
            step=jnp.asarray(int(tree["step"]), jnp.int32))
        args.start_epoch = int(meta.get("epoch", -1)) + 1
        print(f"Resumed (orbax) from {args.resume}: "
              f"step={int(tree['step'])}, start_epoch={args.start_epoch}")

    # Resume (reference train.py:272-277)
    if args.resume and os.path.isfile(args.resume):
        ckpt = load_checkpoint(args.resume)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        variables = partial_load(ckpt["model"], variables, verbose=False)
        state = state.replace(params=variables["params"],
                              batch_stats=variables["batch_stats"])
        if ckpt.get("optimizer") is not None:
            try:
                state = state.replace(opt_state=jax.tree_util.tree_map(
                    jnp.asarray, ckpt["optimizer"]))
            except Exception as e:  # foreign (torch) optimizer state
                print("optimizer state not restored:", e)
        sched = ckpt.get("lr_scheduler") or {}
        if "step" in sched:
            state = state.replace(step=jnp.asarray(int(sched["step"]),
                                                   jnp.int32))
        args.start_epoch = int(ckpt.get("epoch", -1)) + 1

    # Mesh (replaces DataParallel, reference train.py:260-262)
    mesh = None
    if args.data_parallel and len(jax.devices()) > 1:
        n_dev = len(jax.devices())
        if args.batch_size % n_dev:
            raise ValueError(
                f"--data-parallel needs --batch-size divisible by the "
                f"{n_dev} local devices (got {args.batch_size})")
        mesh = make_mesh()
        state = replicate(state, mesh)

    # donate=False: with probabilistic patch/superpixel mixing the state
    # alternates between two jitted step fns — donation would require the
    # donated buffers to match the next callee's layout; the copy cost is
    # ~45 MB/step (params+opt) and negligible next to the step itself.
    step_fns = {
        "patch": make_train_step(model, optimizer, donate=False,
                                 frozen_prefixes=frozen),
        "superpixel": make_train_step(model, optimizer, with_sp_mask=True,
                                      donate=False, frozen_prefixes=frozen),
        "milestones": milestones,
    }

    def device_slic_fn(unnorm, host_rng):
        from videowalk_tpu.ops import slic

        B, T = unnorm.shape[0], unnorm.shape[1]
        n_active = None
        if args.randomise_superpixels:
            lo = args.num_sp - args.randomise_superpixels_range // 2
            hi = args.num_sp + args.randomise_superpixels_range // 2
            n_active = jnp.asarray(host_rng.randint(lo, hi, (B * T,)))
        return slic(unnorm, args.max_sp_num, float(args.compactness),
                    n_active=n_active) if n_active is not None else slic(
            unnorm, args.num_sp, float(args.compactness))

    def checkpoint_fn(state_, epoch_):
        if not args.output_dir:
            return
        if jax.process_count() > 1 and jax.process_index() != 0:
            # params/opt state are replicated; one writer suffices (every
            # process draws the same stochastic-checkpoint coin, so no
            # process skews ahead)
            return
        variables = {"params": jax.device_get(state_.params),
                     "batch_stats": jax.device_get(state_.batch_stats)}
        ck_args = {k: v for k, v in vars(args).items()
                   if isinstance(v, (int, float, str, bool, list, tuple))}
        if getattr(args, "ckpt_format", "pth") == "orbax":
            from videowalk_tpu.utils.checkpoint import save_checkpoint_orbax

            save_checkpoint_orbax(
                os.path.join(args.output_dir, f"orbax_{epoch_}"),
                {"params": variables["params"],
                 "batch_stats": variables["batch_stats"],
                 "opt_state": jax.device_get(state_.opt_state),
                 "step": int(state_.step)},
                metadata={"epoch": epoch_, "milestones": list(milestones),
                          "gamma": args.lr_gamma, "args": ck_args})
            return
        for path in (os.path.join(args.output_dir, f"model_{epoch_}.pth"),
                     os.path.join(args.output_dir, "checkpoint.pth")):
            save_checkpoint(path, variables,
                            optimizer_state=jax.device_get(state_.opt_state),
                            lr_scheduler_state={
                                "step": int(state_.step),
                                "milestones": milestones,
                                "gamma": args.lr_gamma},
                            epoch=epoch_, args=ck_args)

    # Visualisation (reference train.py:238); rank-gated — metrics are
    # replicated, so N processes would log N duplicate wandb runs /
    # interleave the same records into one metrics.jsonl, and each
    # non-primary rank would pay the per-step device fetch for nothing
    vis = None
    if args.visualize and rank == 0:
        from videowalk_tpu.utils.visualize import Visualize

        vis = Visualize(args)

    # Host->device prefetch (replaces the reference's pin_memory + async
    # CUDA copies, code/train.py:225-232); see data/prefetch.py.
    if getattr(args, "prefetch", 0) > 0:
        from videowalk_tpu.data.prefetch import DevicePrefetcher

        # only the views the step functions actually read transfer to HBM
        if getattr(args, "augs_backend", "host") == "device":
            keys = {"raw"}
        else:
            keys = set()
            if args.teacher_student or args.prob > 0:
                keys.add("grid")
            if args.prob < 1 and not args.teacher_student:
                keys.add("whole")
                if args.sp_backend == "device":
                    keys.add("whole_unnorm")
        sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            # put straight to the mesh layout: one H2D per shard, no
            # device-0 staging + reshard (shard_batch later is a no-op)
            sharding = NamedSharding(mesh, PartitionSpec("data"))
        data_loader = DevicePrefetcher(data_loader, args.prefetch,
                                       keys=keys, sharding=sharding)

    print("Start training", end="\n" + "-" * 100 + "\n")
    start_time = time.time()
    rng = jax.random.PRNGKey(args.seed + 1234)
    for epoch in range(args.start_epoch, args.epochs):
        # advance the dataset's per-item RNG streams — without this, a clip
        # index revisited in a later epoch replays the exact decode window
        # and augmentation draws (VideoList iterates in fixed order, so its
        # epochs would be byte-identical)
        if hasattr(dataset, "set_epoch"):
            dataset.set_epoch(epoch)
        state = train_one_epoch(args, model, step_fns, state, data_loader,
                                epoch, mesh, rng, checkpoint_fn,
                                device_slic_fn, vis=vis)

    import datetime as _dt

    total = str(_dt.timedelta(seconds=int(time.time() - start_time)))
    print(f"Training time {total}")
    return state


if __name__ == "__main__":
    from videowalk_tpu.utils.arguments import train_args

    main(train_args())
