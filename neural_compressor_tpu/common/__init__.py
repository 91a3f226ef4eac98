from .config import (
    BaseConfig,
    ComposableConfig,
    ConfigRegistry,
    config_registry,
    register_config,
    get_all_config_set_from_config_registry,
    FRAMEWORK_NAME,
    DEFAULT_WHITE_LIST,
)
from .logger import logger, TuningLogger, set_log_level
from .tuning import (
    ConfigLoader,
    ConfigSet,
    Evaluator,
    evaluator,
    init_tuning,
    Sampler,
    SequentialSampler,
    TuningConfig,
    TuningMonitor,
)
from .utility import (
    options,
    Options,
    Statistics,
    Timer,
    singleton,
    LazyImport,
    dump_elapsed_time,
    log_process,
    call_counter,
)
