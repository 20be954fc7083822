// SPDX-License-Identifier: MIT
pragma solidity ^0.8.25;

import {IVectorX} from "./interfaces/IVectorX.sol";
import {ISuccinctGateway} from "./interfaces/ISuccinctGateway.sol";
import {TimelockedUpgradeable} from "./upgrades/TimelockedUpgradeable.sol";

/// @notice Avail light client: tracks GRANDPA consensus heads and Vector
///         data/state-root commitments.
///
/// @dev Fresh implementation with the same external ABI, storage semantics,
///      and proof I/O encoding as the reference deployment
///      (reference contracts/src/VectorX.sol:13-371), verified against the
///      Python contract model in vectorx_tpu/services/contract.py which the
///      hermetic system tests execute.  Deployed behind an ERC1967Proxy
///      with timelock-gated upgrades (upgrades/TimelockedUpgradeable.sol),
///      matching the reference's proxy deployment; new storage variables
///      must only ever be appended to avoid corrupting proxied state.
contract VectorX is IVectorX, TimelockedUpgradeable {
    /// @notice Circuit breaker (guardian-controlled).
    bool public frozen;

    /// @notice The proof gateway.
    address public gateway;

    /// @notice Highest committed block.
    uint32 public latestBlock;

    /// @notice Authority set id used by the most recent commitHeaderRange.
    uint64 public latestAuthoritySetId;

    /// @notice Function id of the header_range circuit.
    bytes32 public headerRangeFunctionId;

    /// @notice Function id of the rotate circuit.
    bytes32 public rotateFunctionId;

    /// @notice block height => header hash.
    mapping(uint32 => bytes32) public blockHeightToHeaderHash;

    /// @notice authority set id => chained-SHA256 authority set hash.
    mapping(uint64 => bytes32) public authoritySetIdToHash;

    /// @notice keccak256(abi.encode(startBlock, endBlock)) => data root commitment.
    mapping(bytes32 => bytes32) public dataRootCommitments;

    /// @notice keccak256(abi.encode(startBlock, endBlock)) => state root commitment.
    mapping(bytes32 => bytes32) public stateRootCommitments;

    /// @notice range key => start block of that range.
    mapping(bytes32 => uint32) public rangeStartBlocks;

    /// @notice Number of leaves in each header-range commitment tree.
    uint32 public headerRangeCommitmentTreeSize;

    struct InitParameters {
        address guardian;
        address gateway;
        uint32 height;
        bytes32 header;
        uint64 authoritySetId;
        bytes32 authoritySetHash;
        bytes32 headerRangeFunctionId;
        bytes32 rotateFunctionId;
        uint32 headerRangeCommitmentTreeSize;
    }

    function VERSION() external pure returns (string memory) {
        return "1.0.0";
    }

    /// @notice Initialize proxied state (reference VectorX.sol:71-84); the
    ///         guardian also receives the TIMELOCK_ROLE, as the reference
    ///         does — hand it to a Timelock controller for production.
    function initialize(InitParameters calldata p) external initializer {
        gateway = p.gateway;
        blockHeightToHeaderHash[p.height] = p.header;
        latestBlock = p.height;
        authoritySetIdToHash[p.authoritySetId] = p.authoritySetHash;
        latestAuthoritySetId = p.authoritySetId;
        headerRangeFunctionId = p.headerRangeFunctionId;
        rotateFunctionId = p.rotateFunctionId;
        headerRangeCommitmentTreeSize = p.headerRangeCommitmentTreeSize;
        __TimelockedUpgradeable_init(p.guardian, p.guardian);
    }

    // ------------------------------------------------------------------ //
    //                           guardian ops                             //
    // ------------------------------------------------------------------ //

    function updateFreeze(bool _frozen) external onlyGuardian {
        frozen = _frozen;
    }

    function updateGateway(address _gateway) external onlyGuardian {
        gateway = _gateway;
    }

    function updateFunctionIds(
        bytes32 _headerRangeFunctionId,
        bytes32 _rotateFunctionId,
        uint32 _headerRangeCommitmentTreeSize
    ) external onlyGuardian {
        headerRangeFunctionId = _headerRangeFunctionId;
        rotateFunctionId = _rotateFunctionId;
        headerRangeCommitmentTreeSize = _headerRangeCommitmentTreeSize;
    }

    /// @notice Manual state reset for recovery (reference VectorX.sol:108-120).
    function updateGenesisState(
        uint32 _height,
        bytes32 _header,
        uint64 _authoritySetId,
        bytes32 _authoritySetHash
    ) external onlyGuardian {
        blockHeightToHeaderHash[_height] = _header;
        latestBlock = _height;
        authoritySetIdToHash[_authoritySetId] = _authoritySetHash;
        latestAuthoritySetId = _authoritySetId;
    }

    /// @notice Bulk-fill contiguous committed ranges computed off-circuit
    ///         (reference VectorX.sol:122-164; fed by fill_block_range).
    function updateBlockRangeData(
        uint32[] calldata _startBlocks,
        uint32[] calldata _endBlocks,
        bytes32[] calldata _headerHashes,
        bytes32[] calldata _dataRootCommitments,
        bytes32[] calldata _stateRootCommitments,
        uint64 _endAuthoritySetId,
        bytes32 _endAuthoritySetHash
    ) external onlyGuardian {
        require(
            _startBlocks.length > 0 &&
                _startBlocks.length == _endBlocks.length &&
                _endBlocks.length == _headerHashes.length &&
                _headerHashes.length == _dataRootCommitments.length &&
                _dataRootCommitments.length == _stateRootCommitments.length,
            "invalid input lengths"
        );
        require(_startBlocks[0] == latestBlock, "start != latestBlock");
        for (uint256 i = 0; i < _startBlocks.length; i++) {
            if (i < _startBlocks.length - 1) {
                require(_endBlocks[i] == _startBlocks[i + 1], "not contiguous");
            }
            bytes32 key = keccak256(abi.encode(_startBlocks[i], _endBlocks[i]));
            dataRootCommitments[key] = _dataRootCommitments[i];
            stateRootCommitments[key] = _stateRootCommitments[i];
            rangeStartBlocks[key] = _startBlocks[i];
            blockHeightToHeaderHash[_endBlocks[i]] = _headerHashes[i];
            emit HeaderRangeCommitmentStored(
                _startBlocks[i],
                _endBlocks[i],
                _dataRootCommitments[i],
                _stateRootCommitments[i],
                headerRangeCommitmentTreeSize
            );
        }
        latestBlock = _endBlocks[_endBlocks.length - 1];
        authoritySetIdToHash[_endAuthoritySetId] = _endAuthoritySetHash;
        latestAuthoritySetId = _endAuthoritySetId;
    }

    // ------------------------------------------------------------------ //
    //                          header range                              //
    // ------------------------------------------------------------------ //

    /// @notice Request commitments over (latestBlock, _requestedBlock].
    function requestHeaderRange(uint64 _authoritySetId, uint32 _requestedBlock)
        external
        payable
    {
        bytes32 trustedHeader = blockHeightToHeaderHash[latestBlock];
        if (trustedHeader == bytes32(0)) revert TrustedHeaderNotFound();
        bytes32 authoritySetHash = authoritySetIdToHash[_authoritySetId];
        if (authoritySetHash == bytes32(0)) revert AuthoritySetNotFound();
        require(_requestedBlock > latestBlock, "no-op range");

        // packed circuit input: (u32, b32, u64, b32, u32) — must match
        // vectorx_tpu.io.abi.HeaderRangeInput.
        bytes memory input = abi.encodePacked(
            latestBlock,
            trustedHeader,
            _authoritySetId,
            authoritySetHash,
            _requestedBlock
        );
        ISuccinctGateway(gateway).requestCall{value: msg.value}(
            headerRangeFunctionId,
            input,
            address(this),
            abi.encodeWithSelector(
                this.commitHeaderRange.selector,
                _authoritySetId,
                _requestedBlock
            ),
            500000
        );
        emit HeaderRangeRequested(
            latestBlock,
            trustedHeader,
            _authoritySetId,
            authoritySetHash,
            _requestedBlock
        );
    }

    /// @notice Store the verified head + commitments for (latestBlock, _targetBlock].
    function commitHeaderRange(uint64 _authoritySetId, uint32 _targetBlock)
        external
    {
        if (frozen) revert ContractFrozen();
        bytes32 trustedHeader = blockHeightToHeaderHash[latestBlock];
        if (trustedHeader == bytes32(0)) revert TrustedHeaderNotFound();
        bytes32 authoritySetHash = authoritySetIdToHash[_authoritySetId];
        if (authoritySetHash == bytes32(0)) revert AuthoritySetNotFound();
        if (_authoritySetId < latestAuthoritySetId) revert OldAuthoritySetId();
        if (_authoritySetId > latestAuthoritySetId) {
            latestAuthoritySetId = _authoritySetId;
        }
        require(_targetBlock > latestBlock, "no-op range");

        bytes memory input = abi.encodePacked(
            latestBlock,
            trustedHeader,
            _authoritySetId,
            authoritySetHash,
            _targetBlock
        );
        bytes memory output =
            ISuccinctGateway(gateway).verifiedCall(headerRangeFunctionId, input);
        (bytes32 targetHeaderHash, bytes32 stateRootCommitment, bytes32 dataRootCommitment)
        = abi.decode(output, (bytes32, bytes32, bytes32));

        blockHeightToHeaderHash[_targetBlock] = targetHeaderHash;
        bytes32 key = keccak256(abi.encode(latestBlock, _targetBlock));
        dataRootCommitments[key] = dataRootCommitment;
        stateRootCommitments[key] = stateRootCommitment;
        rangeStartBlocks[key] = latestBlock;

        emit HeadUpdate(_targetBlock, targetHeaderHash);
        emit HeaderRangeCommitmentStored(
            latestBlock,
            _targetBlock,
            dataRootCommitment,
            stateRootCommitment,
            headerRangeCommitmentTreeSize
        );
        latestBlock = _targetBlock;
    }

    // ------------------------------------------------------------------ //
    //                              rotate                                //
    // ------------------------------------------------------------------ //

    /// @notice Request the next authority set hash from the epoch-end header.
    function requestRotate(uint64 _currentAuthoritySetId) external payable {
        bytes32 currentHash = authoritySetIdToHash[_currentAuthoritySetId];
        if (currentHash == bytes32(0)) revert AuthoritySetNotFound();
        if (authoritySetIdToHash[_currentAuthoritySetId + 1] != bytes32(0)) {
            revert NextAuthoritySetExists();
        }
        bytes memory input = abi.encodePacked(_currentAuthoritySetId, currentHash);
        ISuccinctGateway(gateway).requestCall{value: msg.value}(
            rotateFunctionId,
            input,
            address(this),
            abi.encodeWithSelector(this.rotate.selector, _currentAuthoritySetId),
            500000
        );
        emit RotateRequested(_currentAuthoritySetId, currentHash);
    }

    /// @notice Store the verified next authority set hash.
    function rotate(uint64 _currentAuthoritySetId) external {
        if (frozen) revert ContractFrozen();
        bytes32 currentHash = authoritySetIdToHash[_currentAuthoritySetId];
        if (currentHash == bytes32(0)) revert AuthoritySetNotFound();
        if (authoritySetIdToHash[_currentAuthoritySetId + 1] != bytes32(0)) {
            revert NextAuthoritySetExists();
        }
        bytes memory input = abi.encodePacked(_currentAuthoritySetId, currentHash);
        bytes memory output =
            ISuccinctGateway(gateway).verifiedCall(rotateFunctionId, input);
        bytes32 newAuthoritySetHash = abi.decode(output, (bytes32));

        authoritySetIdToHash[_currentAuthoritySetId + 1] = newAuthoritySetHash;
        emit AuthoritySetStored(_currentAuthoritySetId + 1, newAuthoritySetHash);
    }
}
