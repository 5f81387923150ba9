from recommendations_tpu.data.data_store import (
    DataStoreInterface,
    DataStoreAccessor,
    LocalDataStore,
    FakeDataStore,
    get_date_range_str,
)
from recommendations_tpu.data.paths import (
    get_train_data_paths,
    get_val_data_paths,
    get_paths_for_worker,
    get_path_chunks,
)
from recommendations_tpu.data.generator import SimpleDatasetGenerator, DataLoaderStrategy, SimpleDataLoaderStrategy, get_data_loader_strategy
from recommendations_tpu.data.grouping import GroupedBatchDataset
from recommendations_tpu.data.loader import HostDataLoader, get_host_dataloader
