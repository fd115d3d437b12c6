#
# lmms-eval model plugin for the unigen_tpu framework.
#
# Installed by scripts/setup_eval.sh into
# third_party/lmms-eval/lmms_eval/models/unigen_tpu.py (the reference swaps its
# whole models dir instead, reference scripts/setup_eval.sh:29-30; its plugin is
# third_party/lmms/models/unigen.py:71-444). All model mechanics live in
# unigen_tpu.evaluation.lmms_adapter; this file only adapts the Instance
# protocol and registers the name.
#
from typing import List, Tuple

from lmms_eval.api.instance import Instance
from lmms_eval.api.model import lmms
from lmms_eval.api.registry import register_model


@register_model("unigen_tpu")
class UniGenTpu(lmms):
    def __init__(
        self,
        config: str,
        pretrained: str = None,
        batch_size: int = 1,
        mm_input_mode: str = "first",
        max_new_tokens: int = 512,
        serving: bool = False,
        serving_slots: int = 16,
        serving_speculate_k: int = 0,
        **kwargs,
    ) -> None:
        super().__init__()
        from unigen_tpu import launch
        launch.apply_platform_env()
        from unigen_tpu.evaluation.lmms_adapter import UniGenLmmsAdapter
        from unigen_tpu.utils.configuration import initialize_config

        overrides = [f"model.unigen.pretrained_model_path={pretrained}"] if pretrained else []
        cfg = initialize_config(config, overrides)
        pipeline = launch.build_pipeline(cfg)
        mode = "concat" if mm_input_mode == "concat" else "first"
        # serving=True routes generate_until through the continuous-batching
        # engine (docs/SERVING.md) — output-identical, higher throughput on
        # mixed decode budgets
        self.adapter = UniGenLmmsAdapter(pipeline, multi_image_mode=mode,
                                         max_new_tokens=max_new_tokens,
                                         serving=bool(serving),
                                         serving_slots=int(serving_slots),
                                         serving_speculate_k=int(serving_speculate_k))
        self.batch_size_per_gpu = int(batch_size)

    # --- lmms protocol -----------------------------------------------------

    def generate_until(self, requests: List[Instance]) -> List[str]:
        packed = []
        for req in requests:
            contexts, gen_kwargs, doc_to_visual, doc_id, task, split = req.args
            visuals = doc_to_visual(self.task_dict[task][split][doc_id])
            packed.append((contexts, gen_kwargs, visuals))
        return self.adapter.generate_until(packed)

    def loglikelihood(self, requests: List[Instance]) -> List[Tuple[float, bool]]:
        packed = []
        for req in requests:
            contexts, doc_to_target, doc_to_visual, doc_id, task, split = req.args
            doc = self.task_dict[task][split][doc_id]
            continuation = doc_to_target(doc) if callable(doc_to_target) else doc_to_target
            packed.append((contexts, continuation, doc_to_visual(doc)))
        return self.adapter.loglikelihood(packed)

    def generate_until_multi_round(self, requests) -> List[str]:
        raise NotImplementedError("multi-round dialogue not supported")
