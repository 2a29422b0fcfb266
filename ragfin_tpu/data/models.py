"""Data contracts for chunks, extracted entities, and API payloads.

Pydantic models with behavioral parity to the reference's
``graph_rag_mcp/models/financial_models.py`` (= ``FinRag_knowledge_graph/
shared/models.py``): same field names, defaults, and validation rules, so that
payloads produced for/by the reference system validate unchanged here.
"""

from __future__ import annotations

from enum import Enum
from typing import Any, Dict, List, Optional

from pydantic import BaseModel, Field

# ===============================
# CHUNK MODELS
# ===============================


class ChunkType(str, Enum):
    BALANCE_SHEET = "balance_sheet_analysis"
    FINANCIAL_RATIOS = "financial_ratios"
    PROFITABILITY = "profitability_analysis"
    SEGMENT_ANALYSIS = "segment_analysis"


class FinancialChunk(BaseModel):
    """A chunk of quarterly-report analysis text.

    Mirrors reference ``financial_models.py:20-26`` (period regex
    ``Q[1-4]_FY\\d{4}``, min text length 10).
    """

    id: str
    period: str = Field(..., pattern=r"Q[1-4]_FY\d{4}")
    type: str
    size: int
    text: str = Field(..., min_length=10)


class IndexedChunk(BaseModel):
    """Full sidecar record stored next to each embedding row.

    Mirrors the Milvus ``fin_chunks`` collection schema
    (reference ``chunking_storing (1).py:14-22``): id, text, period,
    chunk_type, statement_type, primary_value. The embedding itself lives in
    the packed device matrix, not here.
    """

    id: str
    text: str
    period: str
    chunk_type: str
    statement_type: str = "consolidated"
    primary_value: float = 0.0
    # Tenant/company scope (the reference's KG `company_name` /
    # `dataset_id` concept, neo4j_service.py:48, applied to the vector
    # store): enables company-scoped retrieval in multi-company corpora.
    company: str = "ICICI Bank"

    def to_financial_chunk(self) -> FinancialChunk:
        return FinancialChunk(
            id=self.id,
            period=self.period,
            type=self.chunk_type,
            size=len(self.text),
            text=self.text,
        )


# ===============================
# ENTITY MODELS (reference financial_models.py:32-66)
# ===============================


class FinancialMetric(BaseModel):
    name: str
    value: float
    growth_yoy: Optional[float] = None
    unit: Optional[str] = "crore"


class BusinessSegment(BaseModel):
    name: str
    revenue: float
    margin: float
    percentage_of_total: Optional[float] = None


class FinancialRatio(BaseModel):
    name: str
    value: float
    growth_yoy: Optional[float] = None
    unit: Optional[str] = "ratio"


class BalanceSheetItem(BaseModel):
    name: str
    value: float
    percentage_of_total: Optional[float] = None
    unit: Optional[str] = "crore"


class ExtractedEntities(BaseModel):
    """All entities extracted from a chunk."""

    quarter: Optional[str] = None
    financial_metrics: List[FinancialMetric] = []
    business_segments: List[BusinessSegment] = []
    financial_ratios: List[FinancialRatio] = []
    balance_sheet_items: List[BalanceSheetItem] = []

    def total_count(self) -> int:
        return (
            len(self.financial_metrics)
            + len(self.business_segments)
            + len(self.financial_ratios)
            + len(self.balance_sheet_items)
        )


# ===============================
# API REQUEST/RESPONSE MODELS (reference financial_models.py:72-111)
# ===============================


class GraphBuildRequest(BaseModel):
    chunks: List[FinancialChunk]
    dataset_id: str = "icici_fy2024"
    clear_existing: bool = False


class GraphBuildResponse(BaseModel):
    success: bool
    message: str
    chunks_processed: int
    entities_created: int = 0
    relationships_created: int = 0
    dataset_id: str


class GraphQueryRequest(BaseModel):
    question: str = Field(..., min_length=5)
    limit: int = Field(10, ge=1, le=100)


class GraphQueryResponse(BaseModel):
    success: bool
    question: str
    results: List[Dict[str, Any]]
    result_count: int
    execution_time_ms: float = 0.0


class HealthResponse(BaseModel):
    status: str
    neo4j_connected: bool = False  # kept for payload parity; maps to graph store
    entity_service_available: bool = False
    version: str = "1.0.0"


class ErrorResponse(BaseModel):
    error: str
    detail: Optional[str] = None
    timestamp: Optional[float] = None


# ===============================
# EVALUATION MODELS (reference financial_models.py:117-132)
# ===============================


class ModelComparison(BaseModel):
    chunk_id: str
    models_tested: List[str]
    results: Dict[str, ExtractedEntities]
    best_model: Optional[str] = None
    notes: Optional[str] = None


class EvaluationMetrics(BaseModel):
    model_name: str
    total_chunks: int
    successful_extractions: int
    avg_processing_time: float
    entities_per_chunk: float
    accuracy_score: Optional[float] = None


# ===============================
# DATASET MODELS (reference financial_models.py:138-154)
# ===============================


class Dataset(BaseModel):
    id: str
    name: str
    description: Optional[str] = None
    total_chunks: int
    quarters: List[str]
    created_at: Optional[str] = None


class DatasetStats(BaseModel):
    dataset_id: str
    total_nodes: int
    total_relationships: int
    quarters_count: int
    metrics_count: int
    segments_count: int
