"""Request/response models — same REST contract as the reference
(reference main.py:23-47): POST /recommendations and GET /similar_items.
"""

from __future__ import annotations

from typing import List, Optional

from pydantic import BaseModel, Field


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
