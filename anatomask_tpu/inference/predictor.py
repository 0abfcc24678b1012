"""Predictor: load trained model(s), preprocess raw images on the fly, run
Gaussian sliding-window inference with mirror TTA + fold ensembling, export.

Capability parity: /root/reference/nnunetv2/inference/predict_from_raw_data.py:38-846
(nnUNetPredictor): initialize_from_trained_model_folder (multi-fold param list,
deep supervision off), manual_initialization, predict_from_files with
part_id/num_parts sharding + overwrite skip (:264-302), on-the-fly
preprocessing -> predict -> export pipeline (:445), fold-ensemble logit
averaging (:562), sliding-window prediction (:683), mirror TTA (:656).

TPU redesign notes: one jitted fixed-shape tile function per (network, TTA)
combo; TTA flips batched into a single forward; export runs in background
threads (host-side numpy) while the device works on the next case.
"""
from __future__ import annotations

import json
import multiprocessing
import os
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from anatomask_tpu.inference.export import export_prediction_from_logits


def _preprocess_case_worker(plans_dict, configuration_name, dataset_json,
                            image_files, prev_file, cascade_fg_labels, verbose):
    """Spawn-safe preprocessing worker (reference preprocessing worker,
    data_iterators.py:19-57): reconstructs the plans/configuration managers in
    the child process and returns the preprocessed fp32 volume + properties."""
    from anatomask_tpu.plans.plans_handler import PlansManager
    pm = PlansManager(plans_dict)
    cm = pm.get_configuration(configuration_name)
    rw = pm.image_reader_writer_class()
    pp = cm.preprocessor_class(verbose=verbose)
    data, props = rw.read_images(image_files)
    seg_prev = rw.read_seg(prev_file)[0][0] if prev_file else None
    data_pp, _ = pp.run_case_npy(data, None, props, pm, cm, dataset_json)
    if seg_prev is not None and cascade_fg_labels:
        from anatomask_tpu.plans.label_handling import convert_labelmap_to_one_hot
        onehot = convert_labelmap_to_one_hot(seg_prev, cascade_fg_labels,
                                             output_dtype=data_pp.dtype)
        data_pp = np.vstack([data_pp, onehot])
    return data_pp, props
from anatomask_tpu.inference.sliding_window import (
    is_oom_error, make_tile_predictor, sliding_window_predict,
    sliding_window_predict_device_resident)
from anatomask_tpu.models.build import build_network_from_plans
from anatomask_tpu.plans.label_handling import determine_num_input_channels
from anatomask_tpu.plans.plans_handler import PlansManager, load_json
from anatomask_tpu.preprocessing.preprocessor import DefaultPreprocessor
from anatomask_tpu.training.checkpoint import load_checkpoint


class Predictor:
    def __init__(
        self,
        tile_step_size: float = 0.5,
        use_gaussian: bool = True,
        use_mirroring: bool = True,
        tile_batch_size: int = 2,
        verbose: bool = False,
        allow_tqdm: bool = False,
        dtype=jnp.float32,
    ):
        self.tile_step_size = tile_step_size
        self.use_gaussian = use_gaussian
        self.use_mirroring = use_mirroring
        self.tile_batch_size = tile_batch_size
        self.verbose = verbose
        self.dtype = dtype

        self.plans_manager: Optional[PlansManager] = None
        self.configuration_manager = None
        self.dataset_json: Optional[dict] = None
        self.network = None
        self.list_of_parameters: List[dict] = []
        self.allowed_mirroring_axes: Optional[Sequence[int]] = None
        self.label_manager = None
        self._configuration_name: Optional[str] = None
        self._tile_fn = None

    # --- initialization -------------------------------------------------------
    def initialize_from_trained_model_folder(
        self,
        model_training_output_dir: str,
        use_folds: Union[Sequence[Union[int, str]], None] = None,
        checkpoint_name: str = "checkpoint_final.npz",
    ):
        if use_folds is None:
            use_folds = self.auto_detect_available_folds(model_training_output_dir, checkpoint_name)
        dataset_json = load_json(os.path.join(model_training_output_dir, "dataset.json"))
        plans_manager = PlansManager(os.path.join(model_training_output_dir, "plans.json"))

        parameters = []
        configuration_name = None
        mirror_axes = None
        arch_name = None
        for f in use_folds:
            fdir = os.path.join(model_training_output_dir, f"fold_{f}" if f != "all" else "fold_all")
            arrays, meta = load_checkpoint(os.path.join(fdir, checkpoint_name))
            parameters.append(arrays["network_weights"])
            configuration_name = meta.get("configuration_name", configuration_name)
            mirror_axes = meta.get("inference_allowed_mirroring_axes", mirror_axes)
            arch_name = meta.get("network_arch_name", arch_name)

        self._configuration_name = configuration_name or "3d_fullres"
        configuration_manager = plans_manager.get_configuration(configuration_name or "3d_fullres")
        num_input_channels = determine_num_input_channels(plans_manager, configuration_manager, dataset_json)
        label_manager = plans_manager.get_label_manager(dataset_json)
        network = build_network_from_plans(
            plans_manager, configuration_manager, num_input_channels,
            label_manager.num_segmentation_heads, arch_name=arch_name,
            deep_supervision=False, dtype=self.dtype,
        )
        self.manual_initialization(
            network, plans_manager, configuration_manager, parameters,
            dataset_json, mirror_axes,
        )

    @staticmethod
    def auto_detect_available_folds(model_training_output_dir: str, checkpoint_name: str) -> List[int]:
        folds = []
        for d in sorted(os.listdir(model_training_output_dir)):
            if d.startswith("fold_") and d != "fold_all" and os.path.isfile(
                os.path.join(model_training_output_dir, d, checkpoint_name)
            ):
                folds.append(int(d.split("_")[-1]))
        if not folds:
            raise RuntimeError(f"no fold checkpoints found in {model_training_output_dir}")
        return folds

    def manual_initialization(
        self, network, plans_manager, configuration_manager, parameters,
        dataset_json, inference_allowed_mirroring_axes,
    ):
        """Used directly by the trainer's in-training validation."""
        self.network = network
        self.plans_manager = plans_manager
        self.configuration_manager = configuration_manager
        self.list_of_parameters = parameters
        self.dataset_json = dataset_json
        self.allowed_mirroring_axes = inference_allowed_mirroring_axes
        self.label_manager = plans_manager.get_label_manager(dataset_json)
        mirror_axes = self.allowed_mirroring_axes if self.use_mirroring else None

        def apply_fn(params, x):
            out = self.network.apply({"params": params}, x)
            if isinstance(out, (tuple, list)):
                out = out[0]
            return out.astype(jnp.float32)

        self._apply_fn = apply_fn
        self._tile_fns = {}
        self._mirror_axes = tuple(mirror_axes) if mirror_axes is not None else None
        # one params-taking tile fn shared by every fold: the device-resident
        # whole-volume program then compiles ONCE per volume shape instead of
        # once per (fold, shape) — fold weights ride as a traced argument
        self._tile_fn_p = make_tile_predictor(apply_fn, self._mirror_axes,
                                              takes_params=True)

    def _tile_fn_for(self, params):
        key = id(params)
        if key not in self._tile_fns:
            fn = make_tile_predictor(lambda x: self._apply_fn(params, x), self._mirror_axes)
            self._tile_fns[key] = fn
        return self._tile_fns[key]

    # --- prediction -----------------------------------------------------------
    @staticmethod
    def _fits_device_resident(data: np.ndarray, num_out: int,
                              budget_bytes: Optional[int] = None,
                              tile_size: Optional[Sequence[int]] = None) -> bool:
        """Whole-volume device-resident sliding window needs volume + logits +
        weights in HBM alongside the network. Budget default 4 GB
        (ATK_SW_DEVICE_BUDGET_MB overrides; ATK_SW_DEVICE=0 disables)."""
        if os.environ.get("ATK_SW_DEVICE", "1") != "1":
            return False
        if budget_bytes is None:
            budget_bytes = int(os.environ.get("ATK_SW_DEVICE_BUDGET_MB",
                                              "4096")) * 2 ** 20
        # the runner pads each spatial dim up to the tile size, and the scan
        # carry double-buffers logits+weights — budget the PADDED shape x2
        tile = tile_size if tile_size is not None else (1, 1, 1)
        vox = int(np.prod([max(int(s), int(t))
                           for s, t in zip(data.shape[1:], tile)]))
        need = 4 * (vox * data.shape[0] + 2 * (vox * num_out + vox))
        return need <= budget_bytes

    def predict_sliding_window_return_logits(self, data: np.ndarray) -> np.ndarray:
        """data: (c, x, y, z) preprocessed. Fold-ensemble averaged logits.

        Volumes that fit the HBM budget run fully device-resident (tiles
        sliced + Gaussian-accumulated on device inside one jitted scan; host
        traffic = volume in + logits out). Larger volumes stream tile batches
        (device accumulation, host spill on OOM) as before."""
        num_out = self.label_manager.num_segmentation_heads
        tile_size = self.configuration_manager.patch_size
        device_resident = self._fits_device_resident(data, num_out,
                                                     tile_size=tile_size)
        logits = None
        # the budget gate models volume+logits+weights, not the tile
        # forward's activations (x8 under mirror TTA): an HBM OOM at compile
        # time degrades tile_batch_size to 1, then to the streaming path
        # (which itself spills to host accumulation — the reference's
        # GPU-OOM -> CPU ladder, predict_from_raw_data.py)
        tile_batches = [b for b in (self.tile_batch_size, 1) if b >= 1]
        tile_batches = sorted(set(tile_batches), reverse=True)
        for params in self.list_of_parameters:
            pred = None
            while device_resident:
                try:
                    pred = sliding_window_predict_device_resident(
                        data, self._tile_fn_p, tile_size, num_out,
                        tile_step_size=self.tile_step_size,
                        use_gaussian=self.use_gaussian,
                        tile_batch_size=tile_batches[0],
                        params=params,
                    )
                    break
                except Exception as e:  # noqa: BLE001
                    if not is_oom_error(e):
                        raise
                    if len(tile_batches) > 1:
                        tile_batches.pop(0)  # sticks for the remaining folds
                        if self.verbose:
                            print("device-resident sliding window OOM; "
                                  f"retrying with tile_batch_size={tile_batches[0]}")
                    else:
                        device_resident = False
                        if self.verbose:
                            print("device-resident sliding window OOM; "
                                  "falling back to the streaming path")
            if pred is None:
                pred = sliding_window_predict(
                    data, self._tile_fn_p, tile_size, num_out,
                    tile_step_size=self.tile_step_size, use_gaussian=self.use_gaussian,
                    tile_batch_size=tile_batches[0], verbose=self.verbose,
                    params=params,
                )
            logits = pred if logits is None else logits + pred
        return logits / len(self.list_of_parameters)

    predict_logits_from_preprocessed_data = predict_sliding_window_return_logits

    def predict_single_npy_array(
        self, input_image: np.ndarray, image_properties: dict,
        segmentation_previous_stage: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        """(c, x, y, z) raw image + properties -> segmentation on original grid."""
        pp = self.configuration_manager.preprocessor_class(verbose=self.verbose)
        props = dict(image_properties)
        data, seg = pp.run_case_npy(
            input_image.astype(np.float32), None, props,
            self.plans_manager, self.configuration_manager, self.dataset_json,
        )
        if segmentation_previous_stage is not None:
            data = self._stack_previous_stage(data, segmentation_previous_stage)
        logits = self.predict_sliding_window_return_logits(data)
        from anatomask_tpu.inference.export import (
            convert_predicted_logits_to_segmentation_with_correct_shape,
        )
        return convert_predicted_logits_to_segmentation_with_correct_shape(
            logits, self.plans_manager, self.configuration_manager,
            self.label_manager, props,
        )

    def _make_preprocessing_pool(self, num_workers: int):
        """(executor, is_process_pool). Worker PROCESSES when num_workers > 1
        and a configuration name is known (needed to rebuild the managers in
        the child); threads otherwise."""
        if num_workers > 1 and self._configuration_name is not None:
            try:
                from concurrent.futures import ProcessPoolExecutor
                ctx = multiprocessing.get_context("spawn")
                return ProcessPoolExecutor(max_workers=num_workers,
                                           mp_context=ctx), True
            except Exception as e:
                if self.verbose:
                    print(f"process pool unavailable ({e}); using threads")
        return ThreadPoolExecutor(max_workers=max(1, num_workers)), False

    def _stack_previous_stage(self, data: np.ndarray, prev_seg: np.ndarray) -> np.ndarray:
        from anatomask_tpu.plans.label_handling import convert_labelmap_to_one_hot
        onehot = convert_labelmap_to_one_hot(
            prev_seg, self.label_manager.foreground_labels, output_dtype=data.dtype
        )
        return np.vstack([data, onehot])

    # --- file-level driver ----------------------------------------------------
    def _manage_input_and_output_lists(
        self, list_of_lists_or_source_folder, output_folder_or_list,
        folder_with_segs_from_prev_stage=None, overwrite: bool = True,
        part_id: int = 0, num_parts: int = 1, save_probabilities: bool = False,
    ):
        ending = self.dataset_json["file_ending"]
        if isinstance(list_of_lists_or_source_folder, str):
            from anatomask_tpu.utils.helpers import get_case_identifiers_from_raw
            src = list_of_lists_or_source_folder
            idents = sorted({
                f[: -len(ending)].rsplit("_", 1)[0]
                for f in os.listdir(src) if f.endswith(ending)
            })
            n_channels = len(self.dataset_json.get("channel_names", self.dataset_json.get("modality")))
            list_of_lists = [
                [os.path.join(src, f"{i}_{c:04d}{ending}") for c in range(n_channels)]
                for i in idents
            ]
        else:
            list_of_lists = list(list_of_lists_or_source_folder)
            idents = [os.path.basename(l[0])[: -len(ending)].rsplit("_", 1)[0] for l in list_of_lists]

        if isinstance(output_folder_or_list, str):
            out_files = [os.path.join(output_folder_or_list, i) for i in idents]
        elif output_folder_or_list is None:
            out_files = [None] * len(idents)
        else:
            out_files = list(output_folder_or_list)

        prev_stage_files = [
            os.path.join(folder_with_segs_from_prev_stage, i + ending)
            if folder_with_segs_from_prev_stage else None
            for i in idents
        ]

        # part sharding
        list_of_lists = list_of_lists[part_id::num_parts]
        out_files = out_files[part_id::num_parts]
        prev_stage_files = prev_stage_files[part_id::num_parts]

        if not overwrite:
            keep = []
            for i, of in enumerate(out_files):
                if of is None or not os.path.isfile(of + ending):
                    keep.append(i)
                elif save_probabilities and not os.path.isfile(of + ".npz"):
                    keep.append(i)
            list_of_lists = [list_of_lists[i] for i in keep]
            out_files = [out_files[i] for i in keep]
            prev_stage_files = [prev_stage_files[i] for i in keep]
        return list_of_lists, out_files, prev_stage_files

    def predict_from_files(
        self,
        list_of_lists_or_source_folder,
        output_folder_or_list,
        save_probabilities: bool = False,
        overwrite: bool = True,
        num_processes_preprocessing: int = 3,
        num_processes_segmentation_export: int = 3,
        folder_with_segs_from_prev_stage: Optional[str] = None,
        num_parts: int = 1,
        part_id: int = 0,
    ):
        if isinstance(output_folder_or_list, str):
            # full provenance (reference predict_from_raw_data.py:326-339: every
            # predict_from_files argument + dataset.json + plans.json, so
            # postprocessing/ensembling can reconstruct the run)
            os.makedirs(output_folder_or_list, exist_ok=True)
            args = {
                "list_of_lists_or_source_folder": (
                    list_of_lists_or_source_folder
                    if isinstance(list_of_lists_or_source_folder, str)
                    else [list(l) for l in list_of_lists_or_source_folder]),
                "output_folder_or_list": output_folder_or_list,
                "save_probabilities": save_probabilities,
                "overwrite": overwrite,
                "num_processes_preprocessing": num_processes_preprocessing,
                "num_processes_segmentation_export": num_processes_segmentation_export,
                "folder_with_segs_from_prev_stage": folder_with_segs_from_prev_stage,
                "num_parts": num_parts, "part_id": part_id,
                "tile_step_size": self.tile_step_size,
                "use_gaussian": self.use_gaussian,
                "use_mirroring": self.use_mirroring,
                "tile_batch_size": self.tile_batch_size,
                "configuration_name": self._configuration_name,
            }
            with open(os.path.join(output_folder_or_list, "predict_from_raw_data_args.json"), "w") as f:
                json.dump(args, f, indent=2)
            if self.dataset_json is not None:
                with open(os.path.join(output_folder_or_list, "dataset.json"), "w") as f:
                    json.dump(self.dataset_json, f, indent=2, sort_keys=False)
            if self.plans_manager is not None:
                with open(os.path.join(output_folder_or_list, "plans.json"), "w") as f:
                    json.dump(self.plans_manager.plans, f, indent=2, sort_keys=False)

        lists, out_files, prev_files = self._manage_input_and_output_lists(
            list_of_lists_or_source_folder, output_folder_or_list,
            folder_with_segs_from_prev_stage, overwrite, part_id, num_parts,
            save_probabilities,
        )
        if not lists:
            return []

        rw = self.plans_manager.image_reader_writer_class()
        pp = self.configuration_manager.preprocessor_class(verbose=self.verbose)
        results = []

        def _load_and_preprocess(image_files, prev_file):
            data, props = rw.read_images(image_files)
            seg_prev = rw.read_seg(prev_file)[0][0] if prev_file else None
            data_pp, _ = pp.run_case_npy(
                data, None, props, self.plans_manager, self.configuration_manager,
                self.dataset_json,
            )
            if seg_prev is not None:
                data_pp = self._stack_previous_stage(data_pp, seg_prev)
            return data_pp, props

        # preprocessing is prefetched in N WORKER PROCESSES (reference
        # preprocessing_iterator_fromfiles spawns num_processes workers with a
        # bounded queue, data_iterators.py:60); export runs off-thread so the
        # device pipeline never waits on host I/O. Falls back to threads when
        # multiprocessing is unavailable (or num_processes_preprocessing <= 1).
        pp_pool_cm, is_procs = self._make_preprocessing_pool(num_processes_preprocessing)
        with ThreadPoolExecutor(max_workers=max(1, num_processes_segmentation_export)) as export_pool, \
                pp_pool_cm as pp_pool:
            if is_procs:
                cfg_name = self._configuration_name
                fg = tuple(self.label_manager.foreground_labels) if (
                    self.configuration_manager.previous_stage_name is not None) else None
                submit = lambda im, pv: pp_pool.submit(
                    _preprocess_case_worker, self.plans_manager.plans, cfg_name,
                    self.dataset_json, im, pv, fg, self.verbose)
            else:
                submit = lambda im, pv: pp_pool.submit(_load_and_preprocess, im, pv)
            # bounded prefetch window: at most num_processes_preprocessing + 1
            # cases in flight, so completed fp32 volumes cannot accumulate
            # unboundedly ahead of the sequential prediction consumer
            # (reference bounds its preprocessing queue the same way).
            window = max(1, num_processes_preprocessing) + 1
            work = list(zip(lists, prev_files))
            pp_futures = [submit(im, pv) for im, pv in work[:window]]
            next_submit = len(pp_futures)
            futures = []
            for i, out_file in enumerate(out_files):
                data_pp, props = pp_futures[i].result()
                pp_futures[i] = None  # release the preprocessed volume
                if next_submit < len(work):
                    pp_futures.append(submit(*work[next_submit]))
                    next_submit += 1
                logits = self.predict_sliding_window_return_logits(data_pp)
                if out_file is not None:
                    futures.append(export_pool.submit(
                        export_prediction_from_logits, logits, props,
                        self.configuration_manager, self.plans_manager,
                        self.dataset_json, out_file, save_probabilities,
                    ))
                    results.append(out_file)
                else:
                    results.append(logits)
            for fu in futures:
                fu.result()
        return results
