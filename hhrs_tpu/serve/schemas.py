"""Request/response models — same REST contract as the reference
(reference main.py:23-47): POST /recommendations and GET /similar_items.
"""

from __future__ import annotations

from typing import List, Optional

from pydantic import BaseModel, Field

# The batch endpoint's single padded program shape (and request cap); the
# HTTP layer re-exports it — one source for the enforced and published
# contract.
HTTP_BATCH_PAD = 64


class RecommendationRequest(BaseModel):
    user_id: int = Field(..., examples=[15], description="ID of the user for personalization")
    city: str = Field(..., examples=["Sochi"], description="The city where hotels are being searched")
    type: str = Field(
        "friends", examples=["personal"], description="Type of recommendations: 'friends' or 'personal'"
    )
    lambda_param: float = Field(
        0.7, ge=0.0, le=1.0, description="MMR parameter (0.0 = max diversity, 1.0 = max accuracy)"
    )


class SimilarItemsResponse(BaseModel):
    similar_item_ids: List[int]


class HotelResponse(BaseModel):
    hotel_id: int
    city: Optional[str] = None
    price_rub: Optional[float] = None
    stars: Optional[float] = None
    recommended_by: List[int] = []


class RecommendationResponse(BaseModel):
    ranked_hotels: List[HotelResponse]
    message: Optional[str] = None


class BatchRecommendationRequest(BaseModel):
    """POST /recommendations/batch: up to HTTP_BATCH_PAD requests scored as
    ONE padded device program (beyond the reference's contract)."""

    requests: List[RecommendationRequest] = Field(..., min_length=1,
                                                  max_length=HTTP_BATCH_PAD)


class BatchRecommendationResponse(BaseModel):
    responses: List[RecommendationResponse]


class ErrorResponse(BaseModel):
    """404/405/422/500 body shape (FastAPI-compatible ``detail``; 422
    detail may be a string or the validator's structured error list)."""

    detail: object
